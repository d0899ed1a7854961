"""Host-side input pipeline: decode + augment in threads, prefetch to device.

The reference uses 4 torch DataLoader worker processes running PIL decode +
``RandomResizedCrop`` + 90-degree-rotation + normalize per sample
(/root/reference/dataset.py:16-22, trainer.py:287-290). The TPU-native
equivalent: a thread pool decodes and augments to fixed-shape uint8 NHWC
batches (PIL releases the GIL during decode/resize), a background thread
keeps a bounded queue of device-resident batches ahead of the training loop,
and the [-1,1] normalization runs fused inside the jitted train step
(:func:`msig_tpu.train.step.prepare_images`) — one H2D copy of uint8 per
batch instead of float32 (4x less PCIe/ICI traffic).

Augmentation parity (torchvision semantics):
  - RandomResizedCrop: 10 attempts of area in scale=(0.08,1.0) x log-uniform
    aspect in (3/4, 4/3), else torchvision's center-crop fallback; bilinear
    resize to (size, size).
  - RandomChoice of {0, 90, 180, 270}-degree rotations — lossless k*90
    rot90 on square crops.
"""

from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
from PIL import Image

from msig_tpu.data import native_loader
from msig_tpu.data.dataset import MultiDomainDataset


def random_resized_crop_params(
    rng: np.random.Generator,
    height: int,
    width: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """(top, left, crop_h, crop_w) with torchvision RandomResizedCrop semantics."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # Fallback: center crop at the nearest valid aspect ratio
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def load_train_image(
    path: str, size: int, rng: np.random.Generator, backend: str = "auto"
) -> np.ndarray:
    """Decode + RandomResizedCrop(size) + k*90 rotation -> uint8 [size,size,3].

    ``backend='auto'`` uses the native C++ core (decode + fused crop-resize +
    rotate, msig_tpu/data/native_loader.py) when built, else PIL. Both draw
    from ``rng`` in the same order (crop params, then rotation k), so the
    sampled augmentation sequence is backend-independent.
    """
    if backend != "pil" and native_loader.available():
        w, h = native_loader.image_size(path)
        top, left, ch, cw = random_resized_crop_params(rng, h, w)
        k = int(rng.integers(4))
        return native_loader.decode_resize(path, size, (top, left, ch, cw), k)
    with Image.open(path) as img:
        img = img.convert("RGB")
        top, left, h, w = random_resized_crop_params(rng, img.height, img.width)
        k = int(rng.integers(4))
        img = img.resize((size, size), Image.BILINEAR, box=(left, top, left + w, top + h))
        arr = np.asarray(img, dtype=np.uint8)
    if k:
        arr = np.ascontiguousarray(np.rot90(arr, k))
    return arr


def load_inference_image(path: str, size: int, backend: str = "auto") -> np.ndarray:
    """Decode + Resize((size,size)) -> uint8 (reference dataset.py:100-104)."""
    if backend != "pil" and native_loader.available():
        return native_loader.decode_resize(path, size)
    with Image.open(path) as img:
        img = img.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)


class TrainLoader:
    """Epoch iterator yielding device-ready uint8 batches with prefetch.

    Semantics parity: shuffled indices, ``drop_last=True``
    (reference trainer.py:287-290); per-sample uniform target-domain choice.
    """

    def __init__(
        self,
        dataset: MultiDomainDataset,
        batch_size: int,
        image_size: int,
        seed: int = 0,
        num_threads: int = 4,
        prefetch: int = 2,
        device_put=None,
        second_target: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.device_put = device_put  # optional fn(host_batch)->device_batch
        # EXTENSION: also sample a second image from the SAME target domain
        # per sample (adds a 'target2' batch key) — used by the optional
        # diversity loss; the reference has no such loss.
        self.second_target = second_target

    def steps_per_epoch(self) -> int:
        return len(self.dataset) // self.batch_size

    def _make_batch(self, indices, rng: np.random.Generator, pool) -> Dict[str, np.ndarray]:
        picks = [self.dataset.sample_paths(i, rng) for i in indices]
        trg2_paths = None
        if self.second_target:
            names = {v: k for k, v in self.dataset.domain_to_idx.items()}
            trg2_paths = []
            for _, _, d in picks:
                files = self.dataset.target_files_by_domain[names[d]]
                trg2_paths.append(files[int(rng.integers(len(files)))])
        # independent child RNGs so threads do not share generator state
        seeds = rng.integers(0, 2**63 - 1, size=3 * len(picks))

        def load(args):
            j, (src, trg, _) = args
            r1 = np.random.default_rng(seeds[3 * j])
            r2 = np.random.default_rng(seeds[3 * j + 1])
            out = (
                load_train_image(src, self.image_size, r1),
                load_train_image(trg, self.image_size, r2),
            )
            if trg2_paths is not None:
                r3 = np.random.default_rng(seeds[3 * j + 2])
                out = out + (load_train_image(trg2_paths[j], self.image_size, r3),)
            return out

        results = list(pool.map(load, enumerate(picks)))
        batch = {
            "source": np.stack([r[0] for r in results]),
            "target": np.stack([r[1] for r in results]),
            "source_domain": np.zeros(len(picks), np.int32),
            "target_domain": np.asarray([p[2] for p in picks], np.int32),
        }
        if trg2_paths is not None:
            batch["target2"] = np.stack([r[2] for r in results])
        return batch

    def epoch(self, epoch_idx: int) -> Iterator[Dict[str, np.ndarray]]:
        """Yield batches for one epoch, prefetching in a background thread."""
        rng = np.random.default_rng((self.seed, epoch_idx))
        indices = rng.permutation(len(self.dataset))
        steps = self.steps_per_epoch()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # Bounded put that observes `stop`: a consumer that abandons the
            # iterator mid-epoch (profile_steps takes n+1 batches; any
            # exception in the train loop) would otherwise leave this thread
            # blocked in q.put() forever, pinning up to `prefetch`
            # device-resident batches in HBM for the process lifetime.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for s in range(steps):
                        if stop.is_set():
                            return
                        batch = self._make_batch(
                            indices[s * self.batch_size : (s + 1) * self.batch_size], rng, pool
                        )
                        if self.device_put is not None:
                            batch = self.device_put(batch)
                        if not _put(batch):
                            return
                _put(None)
            except BaseException as e:  # propagate instead of hanging the consumer
                _put(e)

        t = threading.Thread(target=producer, daemon=True, name="msig-train-prefetch")
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    # Same outcome as the reference's DataLoader: an unreadable
                    # training image fails the run loudly (the reference has no
                    # skip path in training, /root/reference/dataset.py:66-88) —
                    # but never a silent hang.
                    raise batch
                yield batch
        finally:
            stop.set()
            while True:  # release a producer mid-put and drop HBM references
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
