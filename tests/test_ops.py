"""Golden-value tests for the alias-free signal ops against brute-force numpy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.ops import (
    bias_act,
    design_lowpass_filter,
    filtered_lrelu,
    modulated_conv2d,
    upfirdn2d,
)


def _upfirdn2d_numpy(x, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1.0):
    """Brute-force NHWC upfirdn: zero-stuff, pad, true-convolve, decimate."""
    b, h, w, c = x.shape
    px0, px1, py0, py1 = padding
    if f is None:
        f = np.ones([1, 1], dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    # upsample
    up_h, up_w = h * up, w * up
    xu = np.zeros([b, up_h, up_w, c], dtype=np.float64)
    xu[:, ::up, ::up, :] = x
    # pad (negative = crop)
    def _pad_axis(a, lo, hi, axis):
        if lo > 0 or hi > 0:
            widths = [(0, 0)] * a.ndim
            widths[axis] = (max(lo, 0), max(hi, 0))
            a = np.pad(a, widths)
        if lo < 0:
            a = np.take(a, range(-lo, a.shape[axis]), axis=axis)
        if hi < 0:
            a = np.take(a, range(0, a.shape[axis] + hi), axis=axis)
        return a

    xu = _pad_axis(xu, py0, py1, 1)
    xu = _pad_axis(xu, px0, px1, 2)
    # true convolution with the (possibly separable) filter, scaled by gain
    if np.ndim(f) == 1:
        f2 = np.outer(f, f)
    else:
        f2 = f
    f2 = f2 * gain
    th, tw = f2.shape
    oh = xu.shape[1] - th + 1
    ow = xu.shape[2] - tw + 1
    out = np.zeros([b, oh, ow, c], dtype=np.float64)
    ff = f2[::-1, ::-1]
    for i in range(th):
        for j in range(tw):
            out += ff[i, j] * xu[:, i : i + oh, j : j + ow, :]
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (0, 0, 0, 0)),
    (2, 1, (3, 2, 3, 2)),
    (1, 2, (2, 2, 2, 2)),
    (2, 2, (5, 4, 4, 5)),
    (1, 1, (-1, 2, 0, -1)),
])
@pytest.mark.parametrize("sep", [True, False])
def test_upfirdn2d_matches_numpy(up, down, pad, sep):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 10, 3).astype(np.float32)
    f1 = design_lowpass_filter(numtaps=6, cutoff=0.35, width=0.3, fs=2.0)
    f = f1 if sep else np.outer(f1, f1)
    got = np.asarray(upfirdn2d(jnp.asarray(x), f, up=up, down=down,
                               padding=pad, gain=1.7))
    want = _upfirdn2d_numpy(x, f, up=up, down=down, padding=pad, gain=1.7)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_upfirdn2d_identity():
    x = np.random.RandomState(1).randn(1, 8, 8, 2).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), None))
    np.testing.assert_allclose(got, x, rtol=1e-6)


def test_design_lowpass_filter_props():
    f = design_lowpass_filter(numtaps=12, cutoff=2.0, width=1.5, fs=16.0)
    assert f.shape == (12,) and f.dtype == np.float32
    np.testing.assert_allclose(f.sum(), 1.0, atol=1e-6)  # unit DC gain
    np.testing.assert_allclose(f, f[::-1], atol=1e-7)    # symmetric
    assert design_lowpass_filter(1, 2.0, 1.0, 16.0) is None
    fr = design_lowpass_filter(numtaps=11, cutoff=2.0, width=1.5, fs=16.0,
                               radial=True)
    assert fr.shape == (11, 11)
    np.testing.assert_allclose(fr.sum(), 1.0, atol=1e-5)
    np.testing.assert_allclose(fr, fr.T, atol=1e-7)      # radially symmetric


def test_bias_act_lrelu():
    x = jnp.asarray([[-2.0, 0.5]])
    b = jnp.asarray([1.0, 0.0])
    out = np.asarray(bias_act(x, b, act="lrelu", alpha=0.2, gain=2.0, clamp=1.5))
    # (-2+1) -> -1 -> lrelu -0.2 -> gain -0.4 ; 0.5 -> 1.0
    np.testing.assert_allclose(out, [[-0.4, 1.0]], rtol=1e-6)
    # clamp engages
    out2 = np.asarray(bias_act(jnp.asarray([[3.0]]), act="lrelu", gain=1.0, clamp=1.5))
    np.testing.assert_allclose(out2, [[1.5]])


def test_filtered_lrelu_matches_composition():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 9, 9, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    fu = design_lowpass_filter(8, cutoff=0.4, width=0.4, fs=4.0)
    fd = design_lowpass_filter(8, cutoff=0.4, width=0.4, fs=4.0)
    pad = (6, 5, 5, 6)
    got = np.asarray(
        filtered_lrelu(jnp.asarray(x), fu, fd, jnp.asarray(b), up=2, down=2,
                       padding=pad, gain=np.sqrt(2), slope=0.2, clamp=256.0)
    )
    # Independent composition in numpy.
    xb = x + b[None, None, None, :]
    up = _upfirdn2d_numpy(xb, fu, up=2, padding=pad, gain=4.0)
    act = np.where(up >= 0, up, up * 0.2) * np.sqrt(2)
    act = np.clip(act, -256, 256)
    want = _upfirdn2d_numpy(act, fd, down=2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _modulated_conv_naive(x, w, styles, demodulate, padding, input_gain=None):
    """Per-sample weight materialisation (the grouped-conv formulation)."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)  # [kh,kw,I,O]
    s = np.asarray(styles, np.float64)
    if demodulate:
        w = w / np.sqrt(np.mean(w ** 2, axis=(0, 1, 2), keepdims=True))
        s = s / np.sqrt(np.mean(s ** 2))
    outs = []
    for bi in range(x.shape[0]):
        wb = w * s[bi][None, None, :, None]
        if demodulate:
            d = 1.0 / np.sqrt(np.sum(wb ** 2, axis=(0, 1, 2)) + 1e-8)
            wb = wb * d[None, None, None, :]
        if input_gain is not None:
            wb = wb * input_gain
        xb = x[bi]
        if padding:
            xb = np.pad(xb, ((padding, padding), (padding, padding), (0, 0)))
        kh, kw, ci, co = wb.shape
        oh, ow = xb.shape[0] - kh + 1, xb.shape[1] - kw + 1
        out = np.zeros([oh, ow, co])
        for i in range(kh):
            for j in range(kw):
                out += np.einsum(
                    "hwi,io->hwo", xb[i : i + oh, j : j + ow, :], wb[i, j]
                )
        outs.append(out)
    return np.stack(outs)


@pytest.mark.parametrize("demodulate,padding", [(True, 1), (False, 0), (True, 2)])
def test_modulated_conv2d_matches_grouped_form(demodulate, padding):
    rng = np.random.RandomState(3)
    x = rng.randn(3, 7, 7, 5).astype(np.float32)
    w = rng.randn(3, 3, 5, 6).astype(np.float32) * 0.3
    s = (rng.randn(3, 5).astype(np.float32) * 0.5 + 1.0)
    gain = np.float32(0.8)
    got = np.asarray(
        modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
                         demodulate=demodulate, padding=padding, input_gain=gain)
    )
    want = _modulated_conv_naive(x, w, s, demodulate, padding, input_gain=gain)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_auto_mode_tp_mesh_degrades_when_unshardable(monkeypatch):
    """With a model-axis mesh active and channels NOT divisible by it (or a
    per-shard geometry the kernel rejects), 'auto' degrades a Pallas policy
    entry to the banded matmul path, which propagates shardings natively."""
    import jax
    from jax.sharding import Mesh

    import image_compression_2_tpu.ops.flrelu_policy as pol
    from image_compression_2_tpu.ops import filtered_lrelu
    from image_compression_2_tpu.ops.filtered_lrelu import _mesh_axis_sizes

    monkeypatch.setattr(pol, "lookup", lambda *a, **k: "mmfuse2")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 8), jnp.float32)
    fu = np.ones(4, np.float32) / 4

    assert _mesh_axis_sizes() == (1, 1)
    want = filtered_lrelu(x, fu, fu, up=2, down=2, padding=2, mode="matmul")
    devs = np.array(jax.devices()[:3]).reshape(1, 3)  # C=8 % 3 != 0
    with Mesh(devs, ("data", "model")):
        assert _mesh_axis_sizes() == (3, 1)
        got = filtered_lrelu(x, fu, fu, up=2, down=2, padding=2, mode="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tp_mesh_shard_maps_pallas_kernel(monkeypatch):
    """With a model-axis mesh and a per-shard geometry the kernel accepts,
    the Pallas path runs via shard_map over channel shards (depthwise op —
    zero collectives) instead of degrading to matmul (round-4 weak #7).
    Policy is consulted at the per-shard geometry; interpret mode on CPU."""
    import jax
    import jax.experimental.pallas as pl
    from jax.sharding import Mesh

    import image_compression_2_tpu.ops.flrelu_policy as pol
    import image_compression_2_tpu.ops.pallas_flrelu_wfuse2 as wf2
    from image_compression_2_tpu.ops import (design_lowpass_filter,
                                             filtered_lrelu)

    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    wf2._build_call.cache_clear()

    kernel_runs = []
    real_kernel = wf2.filtered_lrelu_wfuse2

    def spy(*a, **k):
        kernel_runs.append(a[0].shape)
        return real_kernel(*a, **k)

    monkeypatch.setattr(wf2, "filtered_lrelu_wfuse2", spy)

    # policy spy: must be consulted at the PER-SHARD channel count
    lookups = []

    def fake_lookup(b, h, w, c, *a, **k):
        lookups.append(c)
        return "mmfuse2"

    monkeypatch.setattr(pol, "lookup", fake_lookup)
    monkeypatch.setattr(pol, "FORCE_PALLAS_ON_CPU", True)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 256), jnp.float32)
    b = jnp.asarray(rng.randn(256), jnp.float32)
    fu = design_lowpass_filter(12, 0.4, 0.4, 4.0)
    kw = dict(up=2, down=2, padding=(9, 8, 8, 9), clamp=256.0)
    want = filtered_lrelu(x, fu, fu, b, mode="matmul", **kw)
    devs = np.array(jax.devices()[:2]).reshape(1, 2)
    with Mesh(devs, ("data", "model")):
        got = filtered_lrelu(x, fu, fu, b, mode="auto", **kw)
    assert lookups == [128]          # per-shard geometry consulted
    assert kernel_runs               # Pallas kernel ran (not matmul)
    assert all(s[-1] == 128 for s in kernel_runs)  # on the channel shard
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
    wf2._build_call.cache_clear()


def test_policy_grad_lookup_and_fallback():
    """The training path (set_train / grad=True) consults the fwd+bwd winner
    table; geometries never measured under grad degrade a non-matmul/sandwich
    forward winner to sandwich (the measured stack-total grad winner)."""
    import image_compression_2_tpu.ops.flrelu_policy as pol

    fwd = {"b8:38x38x512:u2d2:t12,12:p9,8,9,8": "conv",
           "b8:54x54x512:u2d2:t12,12:p9,8,9,8": "matmul"}
    grad = {"b8:38x38x512:u2d2:t12,12:p9,8,9,8": "mmfuse3"}
    orig = pol._policy
    pol._policy = {"winners": fwd, "winners_grad": grad}
    try:
        args = (8, 38, 38, 512, 2, 2, 12, 12, (9, 8, 9, 8))
        assert pol.lookup(*args) == "conv"
        assert pol.lookup(*args, grad=True) == "mmfuse3"
        # nearest-batch fallback applies inside the grad table too
        assert pol.lookup(4, *args[1:], grad=True) == "mmfuse3"
        # measured fwd, unmeasured grad: matmul/sandwich pass through...
        args2 = (8, 54, 54, 512, 2, 2, 12, 12, (9, 8, 9, 8))
        assert pol.lookup(*args2, grad=True) == "matmul"
        # ...but conv/blocked/Pallas degrade to sandwich
        pol._policy["winners"][pol.geometry_key(*args2)] = "blocked"
        assert pol.lookup(*args2, grad=True) == "sandwich"
        # the module flag routes default lookups
        pol.set_train(True)
        assert pol.lookup(*args) == "mmfuse3"
        pol.set_train(False)
        assert pol.lookup(*args) == "conv"
        # never measured at all -> None either way
        assert pol.lookup(8, 999, 999, 3, 2, 2, 12, 12, (0, 0, 0, 0),
                          grad=True) is None
    finally:
        pol._policy = orig


def test_shipped_policy_has_grad_winners():
    """The shipped policy JSON carries the measured fwd+bwd table for the
    256²/b8 training config (runs/r3_grad_timing.txt)."""
    import json
    import image_compression_2_tpu.ops.flrelu_policy as pol

    doc = json.load(open(pol._POLICY_FILE))
    assert len(doc.get("winners_grad", {})) >= 10
    assert all(v in ("matmul", "sandwich", "blocked", "conv",
                     "mmfuse2", "mmfuse3") for v in doc["winners_grad"].values())
