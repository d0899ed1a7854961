"""Batched jit-compiled inference engine (reference-guided synthesis).

The reference's inference loop processes ONE image at a time in eager mode
(/root/reference/inference.py:273-305) — that per-image Python loop is the
throughput gap the TPU build closes. This engine:

  - preloads the style bank with ONE batched style-encoder forward over all
    reference images (vs a Python loop of single-image forwards,
    inference.py:107-123);
  - runs generation in fixed-size batches under one jit (style sampling
    fused in), convs in bfloat16 on the MXU, donated input buffers;
  - pads the final partial batch to keep shapes static, then drops the
    padding on the host;
  - overlaps host JPEG decode (thread pool) with device compute;
  - optionally shards the batch axis over ALL local chips
    (``data_parallel``): params replicated, inputs/outputs split over a
    1-D mesh — GSPMD partitions the bf16 path, and the all-Pallas int8
    path runs per-shard under ``shard_map`` (each chip executes the
    fused kernels on its slice; no cross-chip traffic in the body).

Checkpoint loading prefers EMA weights with raw-weight fallback
(inference.py:46-72) via :func:`msig_tpu.train.checkpoint.load_for_inference`.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msig_tpu.config import InferenceConfig
from msig_tpu.data import list_image_files
from msig_tpu.data.pipeline import load_inference_image
from msig_tpu.infer.styles import sample_styles
from msig_tpu.models import MultiDomainStyleEncoder, StyleCycleGANGenerator
from msig_tpu.train.step import prepare_images

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class InferenceEngine:
    generator: StyleCycleGANGenerator
    style_encoder: MultiDomainStyleEncoder
    gen_params: Dict
    se_params: Dict
    image_size: int
    batch_size: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    # int8 quantized generator (msig_tpu/infer/quantized.py): ~39 dB PSNR vs
    # the bf16 path; slightly faster on v5e. Opt-in for serving.
    quantize_int8: bool = False
    # Yield uint8 images from translate_batches (device-side conversion);
    # False restores [-1,1] float32 outputs.
    out_uint8: bool = False
    # Data-parallel serving mesh (1-D, batch axis). None = single device.
    mesh: Optional[Any] = None

    @staticmethod
    def build(
        cfg: InferenceConfig,
        num_domains: int,
        gen_params: Dict,
        se_params: Dict,
        n_residual_blocks: Optional[int] = None,
        style_dim: Optional[int] = None,
    ) -> "InferenceEngine":
        dtype = jnp.dtype(cfg.compute_dtype)
        mesh = None
        if getattr(cfg, "data_parallel", False):
            from msig_tpu.parallel.mesh import data_mesh_for_batch, replicate

            mesh = data_mesh_for_batch(cfg.batch_size)
            if mesh is not None:
                gen_params = replicate(mesh, gen_params)
                se_params = replicate(mesh, se_params)
        gen = StyleCycleGANGenerator(
            style_dim=style_dim or cfg.style_dim,
            n_residual_blocks=n_residual_blocks or cfg.n_residual_blocks,
            dtype=dtype,
            use_pallas=cfg.use_pallas,
        )
        se = MultiDomainStyleEncoder(
            style_dim=style_dim or cfg.style_dim, num_domains=num_domains, dtype=dtype
        )
        return InferenceEngine(
            generator=gen,
            style_encoder=se,
            gen_params=gen_params,
            se_params=se_params,
            image_size=cfg.image_size,
            batch_size=cfg.batch_size,
            compute_dtype=dtype,
            quantize_int8=getattr(cfg, "quantize", None) == "int8",
            mesh=mesh,
        )

    # ------------------------------------------------------------------
    def encode_styles(self, images_u8: np.ndarray, domain_idx: int) -> jax.Array:
        """Batched style extraction: uint8 [N,H,W,3] -> style bank [N,S] (fp32)."""
        # Cache the compiled encoder across calls (multi-domain preloads would
        # otherwise recompile an identical program per call).
        encode = getattr(self, "_encode_jit", None)
        if encode is None:

            @jax.jit
            def encode(params, imgs, idx):
                x = prepare_images(imgs, self.compute_dtype)
                return self.style_encoder.apply(params, x, idx).astype(jnp.float32)

            object.__setattr__(self, "_encode_jit", encode)

        n = images_u8.shape[0]
        bank = []
        b = min(self.batch_size, n)
        for i in range(0, n, b):
            chunk = images_u8[i : i + b]
            pad = b - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)], 0)
            idx = jnp.full((b,), domain_idx, jnp.int32)
            out = encode(self.se_params, jnp.asarray(chunk), idx)
            bank.append(np.asarray(out)[: b - pad])
        return jnp.asarray(np.concatenate(bank, 0))

    def preload_style_bank(
        self,
        ref_domain_dir: str,
        domain_idx: int,
        max_styles: Optional[int] = None,
        seed: int = 0,
    ) -> jax.Array:
        """Load + encode every reference image of a domain (inference.py:80-129)."""
        files = list_image_files(ref_domain_dir)
        if not files:
            raise ValueError(f"No images found in {ref_domain_dir}")
        if max_styles and len(files) > max_styles:
            rng = np.random.default_rng(seed)
            # Sorted indices keep the bank in directory order, so bank[0] stays
            # "the first reference image" for style_mode='specific'
            # (reference inference.py:166-168).
            chosen = np.sort(rng.choice(len(files), max_styles, replace=False))
            files = [files[i] for i in chosen]
        logger.info("Loading %d style vectors from %s", len(files), ref_domain_dir)

        def safe_load(p):
            try:
                return load_inference_image(p, self.image_size)
            except Exception as e:  # skip unreadable refs (inference.py:121-123)
                logger.warning("Failed to process style image %s: %s", p, e)
                return None

        with ThreadPoolExecutor(4) as pool:
            imgs = [a for a in pool.map(safe_load, files) if a is not None]
        if not imgs:
            raise ValueError(
                f"No valid style vectors could be extracted from {ref_domain_dir}"
            )
        return self.encode_styles(np.stack(imgs), domain_idx)

    # ------------------------------------------------------------------
    def _generate_fn(self):
        # Cache the compiled function: translate_batches may be called many
        # times (e.g. once per style mode for --save_grid) and a fresh jit
        # wrapper per call would recompile the identical program.
        cached = getattr(self, "_generate_jit", None)
        if cached is not None:
            return cached
        fn = self._build_generate_fn()
        object.__setattr__(self, "_generate_jit", fn)
        return fn

    def _build_generate_fn(self):
        gen = self.generator

        if self.quantize_int8:
            from msig_tpu.infer.quantized import (
                quantize_generator_params,
                quantized_generator_apply,
            )

            n_res = gen.n_residual_blocks
            q = quantize_generator_params(
                jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), self.gen_params),
                n_res,
            )

            out_dtype = jnp.uint8 if self.out_uint8 else jnp.float32
            # fused_trunk: None = auto (Pallas on real TPU, XLA on CPU).
            # cfg.use_pallas=True FORCES the fused Pallas kernels — on CPU
            # they run in interpret mode, which is how the multichip dryrun
            # and tests certify the exact shipped serving config (fused
            # int8 Pallas under shard_map) without real chips.
            force_fused = True if gen.use_pallas else None
            apply_q = quantized_generator_apply
            if self.mesh is not None:
                # Pallas kernels are not GSPMD-partitionable; run the whole
                # int8 body per-shard under shard_map (params replicated,
                # batch split — zero collectives in the body).
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                from msig_tpu.parallel.mesh import DATA_AXIS, replicate

                q = replicate(self.mesh, q)
                apply_q = shard_map(
                    lambda qq, im, st: quantized_generator_apply(
                        qq, im, st, n_res=n_res, out_dtype=out_dtype,
                        fused_trunk=force_fused),
                    mesh=self.mesh,
                    in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS),
                    check_vma=False,
                )

            def generate_q(_params, imgs_u8, styles):
                if imgs_u8.dtype != jnp.uint8:
                    imgs_u8 = jnp.clip(
                        jnp.round((imgs_u8.astype(jnp.float32) + 1.0) * 127.5), 0, 255
                    ).astype(jnp.uint8)
                # uint8 output is handled INSIDE the quantized path: the
                # all-Pallas decoder fuses tanh + the serving conversion
                # into its final kernel (ops/fused_dec_int8.py).
                if self.mesh is not None:
                    return apply_q(q, imgs_u8, styles.astype(jnp.float32))
                return apply_q(
                    q, imgs_u8, styles.astype(jnp.float32), n_res=n_res,
                    out_dtype=out_dtype, fused_trunk=force_fused,
                )

            return jax.jit(generate_q, donate_argnums=(1,))

        def generate(params, imgs_u8, styles):
            x = prepare_images(imgs_u8, self.compute_dtype)
            out = gen.apply(params, x, styles.astype(self.compute_dtype))
            if self.out_uint8:
                # [-1,1] -> uint8 ON DEVICE: 4x less device->host traffic
                # (every consumer converts for saving anyway).
                return jnp.clip(jnp.round((out.astype(jnp.float32) + 1.0)
                                          * 127.5), 0, 255).astype(jnp.uint8)
            return out.astype(jnp.float32)

        if self.mesh is not None:
            # Flax convs are per-sample: GSPMD partitions the whole forward
            # along the batch axis with no resharding in the body.
            from msig_tpu.parallel.mesh import batch_sharding, replicated

            data = batch_sharding(self.mesh)
            return jax.jit(
                generate,
                in_shardings=(replicated(self.mesh), data, data),
                out_shardings=data,
                donate_argnums=(1,),
            )
        return jax.jit(generate, donate_argnums=(1,))

    def translate_batches(
        self,
        batches: Iterator[Tuple[np.ndarray, List[str]]],
        style_bank: Optional[jax.Array],
        style_mode: str,
        noise_level: float = 0.1,
        seed: int = 0,
        mapping: Optional[Tuple[Any, Dict, int, int]] = None,
    ) -> Iterator[Tuple[np.ndarray, List[str]]]:
        """uint8 batches + names -> translated images + names.

        Output dtype depends on ``out_uint8``: uint8 [0,255] images when True
        (converted on device — 4x less device->host traffic), float32 [-1,1]
        otherwise.

        ``style_mode='latent'`` (EXTENSION — not in the reference) draws
        z ~ N(0, I) per image and maps it through a
        :class:`msig_tpu.extensions.MappingNetwork`; pass
        ``mapping=(module, params, latent_dim, domain_idx)``.
        """
        generate = self._generate_fn()
        key = jax.random.PRNGKey(seed)
        if style_mode == "latent":
            if mapping is None:
                raise ValueError("style_mode='latent' requires a mapping network")
            map_mod, map_params, latent_dim, domain_idx = mapping

            def draw_styles(sub):
                z = jax.random.normal(sub, (self.batch_size, latent_dim))
                idx = jnp.full((self.batch_size,), domain_idx, jnp.int32)
                return map_mod.apply(map_params, z, idx).astype(jnp.float32)

        else:

            def draw_styles(sub):
                return sample_styles(
                    style_bank, style_mode, sub, self.batch_size, noise_level
                )

        for imgs, names in batches:
            n = imgs.shape[0]
            pad = self.batch_size - n
            if pad:
                # iter_input_batches yields DEVICE arrays (device_put in the
                # producer); pad on device — np.concatenate would force a
                # device->host sync and re-upload of the whole batch.
                xp = jnp if isinstance(imgs, jax.Array) else np
                imgs = xp.concatenate([imgs, xp.repeat(imgs[-1:], pad, 0)], 0)
            key, sub = jax.random.split(key)
            styles = draw_styles(sub)
            out = generate(self.gen_params, jnp.asarray(imgs), styles)
            yield np.asarray(out)[:n], names

    def iter_input_batches(
        self,
        input_dir: str,
        prefetch: int = 2,
        host_tee: Optional[List[Tuple[np.ndarray, List[str]]]] = None,
    ) -> Iterator[Tuple[np.ndarray, List[str]]]:
        """Decode input images in a thread pool, yielding fixed-size batches.

        A producer thread decodes ``prefetch`` batches ahead (same pattern as
        ``TrainLoader.epoch``) so JPEG decode overlaps device compute instead
        of running synchronously between generation steps.

        Closing the generator early (``gen.close()`` or GC after a partial
        iteration) stops the producer thread — it does not stay blocked on
        the queue for process lifetime.

        ``host_tee``: optional list the producer appends each decoded HOST
        batch ``(uint8 array, names)`` to before the device upload — lets a
        multi-domain caller decode the input set once and replay it with
        :meth:`iter_host_batches` (the decode pass dominates e2e on
        single-core hosts).
        """
        files = list_image_files(input_dir)
        if not files:
            return

        def safe_load(p):
            try:
                return load_inference_image(p, self.image_size)
            except Exception as e:  # per-image skip (reference inference.py:302-305)
                logger.warning("Error processing %s: %s", os.path.basename(p), e)
                return None

        import queue
        import threading

        # With a serving mesh, stage full batches directly in the batch
        # sharding so jit doesn't insert a reshard copy per batch. Partial
        # batches stay on host (translate_batches pads them first).
        full_sharding = None
        if self.mesh is not None:
            from msig_tpu.parallel.mesh import batch_sharding

            full_sharding = batch_sharding(self.mesh)

        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        _END = object()
        stop = threading.Event()

        def _put(item) -> bool:
            """Blocking put that aborts if the consumer went away."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(4) as pool:
                    for i in range(0, len(files), self.batch_size):
                        if stop.is_set():
                            return
                        chunk = files[i : i + self.batch_size]
                        loaded = list(pool.map(safe_load, chunk))
                        kept = [
                            (a, os.path.basename(p))
                            for a, p in zip(loaded, chunk)
                            if a is not None
                        ]
                        if not kept:
                            continue
                        arr = np.stack([a for a, _ in kept])
                        names = [n for _, n in kept]
                        if host_tee is not None:
                            host_tee.append((arr, names))
                        # device_put here so the host->device copy overlaps
                        # the previous batch's compute (it dominates e2e on
                        # bandwidth-limited hosts).
                        if full_sharding is not None and len(kept) == self.batch_size:
                            dev = jax.device_put(arr, full_sharding)
                        else:
                            dev = jax.device_put(arr)
                        if not _put((dev, names)):
                            return
            finally:
                # Block-put the sentinel: put_nowait could hit queue.Full
                # with a LIVE consumer that is merely slower than decode
                # (the exact case prefetch exists for), leaving it waiting
                # on q.get() forever. _put drains on stop, so this can't
                # hang when the consumer is actually gone.
                _put(_END)

        t = threading.Thread(target=producer, daemon=True, name="msig-infer-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                yield item
        finally:
            stop.set()
            while True:  # unblock a producer stuck on a full queue
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=30)

    def iter_host_batches(
        self, cached: List[Tuple[np.ndarray, List[str]]]
    ) -> Iterator[Tuple[np.ndarray, List[str]]]:
        """Replay a ``host_tee`` decode cache as device-staged batches.

        Same staging policy as the live producer: full batches go straight
        into the serving-mesh batch sharding (no per-batch reshard copy);
        partial batches stay host-side for translate_batches to pad.
        """
        full_sharding = None
        if self.mesh is not None:
            from msig_tpu.parallel.mesh import batch_sharding

            full_sharding = batch_sharding(self.mesh)
        for arr, names in cached:
            if full_sharding is not None and arr.shape[0] == self.batch_size:
                yield jax.device_put(arr, full_sharding), names
            else:
                yield jax.device_put(arr), names
