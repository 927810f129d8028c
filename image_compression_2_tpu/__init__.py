"""TPU-native StyleGAN3-HVAE neural image compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``yubster4525/image_compression_2`` (StyleGAN3-HVAE neural image codec):

- ``ops``      alias-free signal ops (upfirdn2d, filtered lrelu, modulated conv)
               as pure-lax reference implementations + fused Pallas TPU kernels
- ``models``   StyleGAN3-T generator (mapping + synthesis) and the hierarchical
               VGG-VAE encoder family, written in flax.linen, NHWC, bf16-ready
- ``quant``    uniform latent quantization and Gumbel-Softmax discretization
- ``coding``   CABAC entropy coding: integer-exact arithmetic coder (C++ native
               with a bit-identical Python reference), adaptive context model
- ``codec``    the compressor product API: compress / decompress /
               save_compressed / load_compressed (.npz and .cabac containers)
- ``train``    stage-1 (recon) and stage-2 (Gumbel) training loops, data-parallel
               over a jax.sharding.Mesh, LPIPS-VGG + MSE + KL losses
- ``data``     image-folder and synthetic (G-sampled) datasets
- ``metrics``  PSNR / SSIM / MS-SSIM / bpp / compression-ratio reporting
- ``parallel`` mesh + sharding helpers
- ``compat``   torch checkpoint/pickle weight importers

Everything images: NHWC float32/bfloat16 in [-1, 1] (TPU-native layout).
Latents: [batch, num_ws, w_dim] float32.
"""

__version__ = "0.1.0"
