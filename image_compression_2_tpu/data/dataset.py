"""Datasets + a background-prefetching batch loader.

Capability parity with the reference data layer (SURVEY §2.5):
- ``ImageFolderDataset`` ≙ ``ImageDataset`` (stylegan3_hvae_full.py:936-998):
  recursive folder scan for png/jpg/jpeg (ImageNet class-dir aware), Lanczos
  resize, [-1,1] normalisation.  Corrupt files are skipped with a warning
  (the reference silently recurses to the next index or yields zeros).
- ``SyntheticDataset``  ≙ stylegan3_hvae_full.py:1001-1020: in-memory tensor
  dataset of generator samples (+ optional W vectors).
- ``BatchLoader``: shuffled epochs, fixed batch shapes (drop-remainder by
  default — static shapes keep XLA from recompiling), and a double-buffered
  background thread decoding the next batch while the TPU computes (the
  torch-DataLoader-worker analogue without multiprocessing).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.images import load_image

_EXTS = (".png", ".jpg", ".jpeg")


class ImageFolderDataset:
    def __init__(
        self,
        image_folder: str,
        resolution: int = 256,
        recursive: bool = True,
        file_extensions: Sequence[str] = _EXTS,
        max_images: Optional[int] = None,
    ):
        self.image_folder = image_folder
        self.resolution = resolution
        exts = tuple(e.lower() for e in file_extensions)
        paths: List[str] = []
        if recursive:
            for root, _dirs, files in os.walk(image_folder):
                for f in sorted(files):
                    if f.lower().endswith(exts):
                        paths.append(os.path.join(root, f))
        else:
            for f in sorted(os.listdir(image_folder)):
                if f.lower().endswith(exts):
                    paths.append(os.path.join(image_folder, f))
        if max_images is not None:
            paths = paths[:max_images]
        if not paths:
            raise FileNotFoundError(f"no images under {image_folder}")
        self.paths = paths

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        try:
            return load_image(self.paths[idx], self.resolution)
        except Exception as e:  # corrupt file: deterministic zero image
            print(f"warning: failed to load {self.paths[idx]}: {e}")
            return np.zeros([self.resolution, self.resolution, 3], np.float32)


class SyntheticDataset:
    """In-memory dataset of images [N,H,W,C] (+ optional W vectors)."""

    def __init__(self, images: np.ndarray, w_vectors: Optional[np.ndarray] = None):
        self.images = np.asarray(images)
        self.w_vectors = None if w_vectors is None else np.asarray(w_vectors)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int):
        if self.w_vectors is not None:
            return self.images[idx], self.w_vectors[idx]
        return self.images[idx]


class BatchLoader:
    """Shuffled, prefetching batch iterator with static batch shapes."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    def _make_batch(self, indices: np.ndarray) -> np.ndarray:
        items = [self.dataset[int(i)] for i in indices]
        if isinstance(items[0], tuple):
            return tuple(np.stack([it[j] for it in items]) for j in range(len(items[0])))
        return np.stack(items)

    def __iter__(self) -> Iterator[np.ndarray]:
        idx = self._epoch_indices()
        self.epoch += 1
        n_batches = len(self)
        starts = [i * self.batch_size for i in range(n_batches)]

        if self.prefetch <= 0:
            for s in starts:
                yield self._make_batch(idx[s:s + self.batch_size])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # Re-check stop while blocked on a full queue: a consumer that
            # abandons iteration mid-epoch must not leave this thread (and its
            # pinned batches) blocked on q.put forever.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # An exception from _make_batch must reach the consumer: a dead
            # producer with nothing queued would leave q.get() blocked
            # forever.  Ship the exception itself through the queue.
            try:
                for s in starts:
                    if stop.is_set() or not put(
                        self._make_batch(idx[s:s + self.batch_size])
                    ):
                        return
                put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def generate_synthetic_dataset(
    generator,
    gen_vars,
    num_samples: int = 50,
    batch_size: int = 8,
    resolution: Optional[int] = None,
    seed: int = 42,
    truncation_psi=1.0,
):
    """Sample (images, ws) from the frozen generator — the reference's
    synthetic-data path (stylegan3_hvae_full.py:536-599; seed 42, mapping →
    synthesis → resize to training resolution).

    ``truncation_psi`` may be a float or a sequence of floats; a sequence
    splits ``num_samples`` evenly across the psis (remainder to the first),
    mixing heavily-truncated (smooth, easy) and untruncated (diverse, hard)
    samples — a data-diversity knob for generalisation."""
    import jax
    import jax.numpy as jnp

    psis = (
        tuple(truncation_psi)
        if isinstance(truncation_psi, (tuple, list))
        else (float(truncation_psi),)
    )
    z_dim = generator.cfg.z_dim
    key = jax.random.PRNGKey(seed)
    z_all = jax.random.normal(key, [num_samples, z_dim])

    # per-sample psi: even split across the list (remainder to the first)
    counts = [num_samples // len(psis)] * len(psis)
    counts[0] += num_samples - sum(counts)

    @jax.jit
    def sample(z, psi):
        # truncation as an explicit per-sample lerp toward w_avg so one
        # jitted program serves every psi (psi is a traced [B] vector)
        ws = generator.apply(gen_vars, z, 1.0, method="mapping")
        w_avg = gen_vars["buffers"]["mapping"]["w_avg"]
        ws = w_avg[None, None, :] + psi[:, None, None] * (
            ws - w_avg[None, None, :])
        img = generator.apply(gen_vars, ws, method="synthesis")
        if resolution is not None and img.shape[1] != resolution:
            img = jax.image.resize(
                img, (img.shape[0], resolution, resolution, img.shape[3]),
                method="bilinear",
            )
        return img, ws

    psi_per_sample = jnp.asarray(np.concatenate(
        [np.full(c, p, np.float32) for c, p in zip(counts, psis)]
    ))
    images, ws = [], []
    for i in range(0, num_samples, batch_size):
        z = z_all[i:i + batch_size]
        psi = psi_per_sample[i:i + batch_size]
        if z.shape[0] < batch_size:  # pad to static shape, then trim
            pad = batch_size - z.shape[0]
            img, w = sample(jnp.concatenate([z, z_all[:pad]], axis=0),
                            jnp.concatenate([psi, psi_per_sample[:pad]]))
            img, w = img[: z.shape[0]], w[: z.shape[0]]
        else:
            img, w = sample(z, psi)
        images.append(np.asarray(img))
        ws.append(np.asarray(w))
    return SyntheticDataset(np.concatenate(images), np.concatenate(ws))
