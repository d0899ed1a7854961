#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline (default mode): reference-guided 256x256 inference throughput in
images/s on one chip — the generator forward with per-image style sampling
fused in, batch sweep over {int8, bf16} engine paths, device-resident
steady state (host IO overlaps in the real pipeline; the driver-visible
metric is chip throughput). Baseline: the north-star target of
2000 img/s/chip (BASELINE.md — the reference publishes no numbers; it
loops images one by one in eager torch, reference inference.py:273-305).

Stall-proofing (round 4): the tunneled TPU backend has stalled mid-RPC
three times (2026-08-17/19/20, docs/PERF.md "tunnel stall"); a hung RPC
blocks the calling thread inside C code, so no in-process watchdog can
recover it. The headline mode therefore runs as a SUPERVISOR that:

  1. pre-flight probes the backend in a subprocess (timeout + one retry);
  2. spawns a WORKER subprocess that measures one (mode, batch) config at
     a time — known-winning config FIRST — and streams a JSON line per
     completed config;
  3. enforces a per-config deadline and a total wall-clock deadline; on
     any deadline it kills the worker by exact PID and prints the
     best-so-far measurement (exit 0) if anything was measured, else a
     clear "backend unreachable" diagnostic (exit 1).

A dead tunnel can no longer turn an achieved number into rc=124.

Other modes (for local tuning, not the driver metric):
    python bench.py --mode train   # fused train-step ms at batch 32, 256^2
    python bench.py --mode e2e     # disk JPEG -> engine -> host img/s
    python bench.py --mode data    # host input-pipeline img/s
"""

import argparse
import dataclasses
import json
import os
import queue
import signal
import subprocess
import sys
import threading
import time

import numpy as np

# Persistent compilation cache: Mosaic/XLA compiles through the remote-compile
# path are slow (minutes per Pallas kernel); caching makes repeat bench runs
# start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

# Supervisor knobs (seconds). The first-config deadline is generous
# because a fresh machine cold-compiles the whole Pallas chain through the
# remote-compile path (historically up to ~10 min); a genuinely stalled
# backend is caught much earlier by the pre-flight probe, and a stall
# mid-measurement still ends at this bound instead of hanging forever.
# The SIGTERM handler below is the net for an external (driver) timeout
# firing first: best-so-far still reaches stdout.
PROBE_TIMEOUT = float(os.environ.get("MSIG_BENCH_PROBE_TIMEOUT", "120"))
TOTAL_DEADLINE = float(os.environ.get("MSIG_BENCH_DEADLINE", "1500"))
FIRST_CONFIG_DEADLINE = float(os.environ.get("MSIG_BENCH_CONFIG_DEADLINE", "900"))
# Later configs are new jit programs (batch is shape-specialized) and also
# cold-compile on a fresh machine; the timer resets per ATTEMPT (failed
# configs emit a line too), so 600 s bounds a single config's compile.
NEXT_CONFIG_DEADLINE = float(os.environ.get("MSIG_BENCH_NEXT_DEADLINE", "600"))


def _sync(x) -> float:
    """True device sync: fetch a scalar reduction of ``x``.

    On the tunneled TPU platform used here, ``block_until_ready`` returns
    before execution completes; fetching a scalar is the only reliable
    barrier. The reduction is jitted once and costs one RTT (~26 ms),
    amortized over each timed block.
    """
    import jax
    import jax.numpy as jnp

    global _SYNC_FN
    if "_SYNC_FN" not in globals():
        _SYNC_FN = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    return float(_SYNC_FN(x))


def inference_configs(batch_sizes):
    """(mode, batch) sweep order: known-winning config first.

    int8@128 has been the headline winner since round 3 (BASELINE.md);
    running it first means a later stall still carries the headline.
    """
    ordered = []
    for mode in ("int8", "bf16"):
        for bs in batch_sizes:
            ordered.append((mode, bs))
    return ordered


def run_inference_worker(batch_sizes, iters=20, warmup=3, image_size=256,
                         modes=("int8", "bf16")):
    """Measure each (mode, batch) config; print one JSON line per result.

    Runs inside the worker subprocess. Lines go to stdout flushed so the
    supervisor sees each result the moment it exists; human-readable
    detail goes to stderr.
    """
    fake_stall = os.environ.get("MSIG_BENCH_FAKE_STALL", "")
    if fake_stall == "init":
        time.sleep(10_000)

    import jax
    import jax.numpy as jnp

    from msig_tpu.infer.quantized import (
        quantize_generator_params,
        quantized_generator_apply,
    )
    from msig_tpu.infer.styles import sample_styles
    from msig_tpu.models import StyleCycleGANGenerator
    from msig_tpu.train.step import prepare_images

    dtype = jnp.bfloat16
    use_pallas = os.environ.get("MSIG_BENCH_PALLAS") == "1"
    gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=8, dtype=dtype,
                                 use_pallas=use_pallas)
    img0 = jnp.zeros((1, image_size, image_size, 3), dtype)
    params = gen.init(jax.random.PRNGKey(0), img0, jnp.zeros((1, 256), dtype))
    qparams = quantize_generator_params(params, 8)
    bank = jax.random.normal(jax.random.PRNGKey(1), (10, 256), jnp.float32)

    n_ok = 0
    configs = [(m, b) for m, b in inference_configs(batch_sizes) if m in modes]
    for mode, bs in configs:
        if mode == "bf16":
            def step(params, imgs_u8, bank, key, bs=bs):
                styles = sample_styles(bank, "random", key, bs)
                x = prepare_images(imgs_u8, dtype)
                return gen.apply(params, x, styles.astype(dtype))
            p = params
        else:
            def step(qp, imgs_u8, bank, key, bs=bs):
                styles = sample_styles(bank, "random", key, bs)
                # uint8 output = the serving image (the reference's
                # inference loop saves uint8 PNGs); engages the fused
                # conv7+tanh+uint8 final kernel (ops/fused_dec_int8.py).
                return quantized_generator_apply(
                    qp, imgs_u8, styles, n_res=8, out_dtype=jnp.uint8
                )
            p = qparams

        fn = jax.jit(step)
        rng = np.random.default_rng(0)
        imgs = jax.device_put(
            rng.integers(0, 256, (bs, image_size, image_size, 3), dtype=np.uint8)
        )
        key = jax.random.PRNGKey(2)
        out = None
        try:
            for _ in range(warmup):
                key, sub = jax.random.split(key)
                out = fn(p, imgs, bank, sub)
            _sync(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                key, sub = jax.random.split(key)
                out = fn(p, imgs, bank, sub)
            _sync(out)
        except Exception as e:  # one config failing must not kill the sweep
            print(f"  {mode} batch {bs}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", file=sys.stderr)
            # Failed configs still emit a line: the supervisor resets its
            # per-config timer per ATTEMPT, and can tell "every config
            # failed" apart from "worker stalled".
            print(json.dumps({"config": f"{mode}@{bs}", "failed": True}),
                  flush=True)
            continue
        dt = time.perf_counter() - t0
        rate = bs * iters / dt
        print(f"  {mode} batch {bs}: {rate:.0f} img/s "
              f"({1000 * dt / iters:.2f} ms/batch)", file=sys.stderr)
        print(json.dumps({"config": f"{mode}@{bs}", "rate": round(rate, 1)}),
              flush=True)
        n_ok += 1
        if fake_stall == "after_first" and n_ok == 1:
            time.sleep(10_000)
    print(json.dumps({"done": True}), flush=True)


def _probe_backend() -> bool:
    """Pre-flight: can a fresh process see the device within the timeout?

    Runs in a subprocess because a stalled tunnel hangs device init inside
    C code where no in-process timeout can reach. One retry: the tunnel
    occasionally drops a single RPC but recovers.
    """
    code = "import jax; print(len(jax.devices()))"
    for attempt in (1, 2):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=PROBE_TIMEOUT,
                capture_output=True, text=True,
            )
            if r.returncode == 0 and r.stdout.strip().isdigit():
                return True
            print(f"bench: probe attempt {attempt} rc={r.returncode}: "
                  f"{r.stderr.strip()[-300:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench: probe attempt {attempt} timed out after "
                  f"{PROBE_TIMEOUT:.0f}s (backend stalled?)", file=sys.stderr)
    return False


def _reader_thread(stream, q):
    for line in stream:
        q.put(line)
    q.put(None)


def _wait_or_kill(proc, timeout=30):
    """Reap the worker; if teardown hangs (tunnel stall during PJRT
    shutdown), SIGKILL it rather than crash the supervisor — at this point
    every measurement is already in hand."""
    try:
        proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        print("bench: worker hung in teardown; killing it", file=sys.stderr)
        try:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=10)
        except (OSError, subprocess.TimeoutExpired):
            pass


def _emit_headline(best, best_cfg, measured, args, size_tag, rows=None):
    if args.mode == "latency":
        # Latency mode (VERDICT r4 #7): headline = ms per IMAGE at the
        # smallest measured batch (the reference's interactive usage is
        # batch 1, reference inference.py:274-290); every measured batch
        # is reported in "rows" as ms/batch for the latency curve.
        rows = rows or {}
        by_bs = {int(cfg.split("@")[1]): rate for cfg, rate in rows.items()
                 if rate}
        if not by_bs:
            print("bench: latency mode measured nothing", file=sys.stderr)
            sys.exit(1)
        bs0 = min(by_bs)
        ms_batch = {b: round(1000.0 * b / r, 3) for b, r in sorted(by_bs.items())}
        print(f"  latency rows (ms/batch): {ms_batch}", file=sys.stderr)
        print(json.dumps({
            "metric": f"latency_ms_per_img_{size_tag}px_int8_b{bs0}",
            "value": round(1000.0 / by_bs[bs0], 3),
            "unit": "ms",
            "vs_baseline": None,
            "ms_per_batch": ms_batch,
        }), flush=True)
        return
    print(f"  best: {best_cfg} ({measured} configs measured)", file=sys.stderr)
    print(json.dumps({
        "metric": f"img_per_s_{size_tag}px_ref_guided_inference",
        "value": round(best, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(best / 2000.0, 3) if args.image_size == 256
        else None,
    }), flush=True)


def supervise_inference(args, size_tag):
    """Spawn the measuring worker; enforce deadlines; print the headline."""
    t_start = time.monotonic()
    state = {"best": 0.0, "cfg": "", "measured": 0, "proc": None, "rows": {}}

    def on_term(signum, frame):
        # An EXTERNAL timeout (the driver wraps bench in `timeout`) beat our
        # own deadlines: kill the worker and still put the best-so-far
        # measurement on stdout before dying.
        p = state["proc"]
        if p is not None:
            try:
                p.send_signal(signal.SIGKILL)
            except OSError:
                pass
        if state["measured"] > 0:
            print(f"bench: external signal {signum}; reporting best-so-far",
                  file=sys.stderr)
            _emit_headline(state["best"], state["cfg"], state["measured"],
                           args, size_tag, rows=state["rows"])
            sys.exit(0)
        print(f"bench: external signal {signum} before any measurement",
              file=sys.stderr)
        sys.exit(1)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    if not _probe_backend():
        print("bench: backend unreachable (pre-flight probe failed twice) — "
              "no measurement possible", file=sys.stderr)
        sys.exit(1)

    cmd = [sys.executable, "-u", os.path.abspath(__file__), "--worker",
           "--mode", args.mode, "--iters", str(args.iters),
           "--image_size", str(args.image_size)]
    if args.batches:
        cmd += ["--batches", args.batches]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=sys.stderr,
                            text=True, bufsize=1)
    state["proc"] = proc
    q = queue.Queue()
    threading.Thread(target=_reader_thread, args=(proc.stdout, q),
                     daemon=True).start()

    best, best_cfg = 0.0, ""
    measured = 0
    attempted = 0
    worker_done = False
    config_deadline = FIRST_CONFIG_DEADLINE
    stalled_msg = None
    eof_rc = None
    while True:
        remaining_total = TOTAL_DEADLINE - (time.monotonic() - t_start)
        wait = min(config_deadline, remaining_total)
        if wait <= 0:
            stalled_msg = ("total deadline" if remaining_total <= 0
                           else "per-config deadline")
            break
        try:
            line = q.get(timeout=wait)
        except queue.Empty:
            stalled_msg = (f"no result within {wait:.0f}s "
                           f"(per-config deadline)")
            break
        if line is None:  # worker stdout closed
            _wait_or_kill(proc)
            if not worker_done:
                # EOF without a 'done' record = the worker crash-exited
                # (import error, OOM, ...). Record the rc so the final
                # diagnostic doesn't misattribute it to a tunnel stall.
                eof_rc = proc.returncode
            break
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("done"):
            worker_done = True
            _wait_or_kill(proc)
            break
        attempted += 1
        config_deadline = NEXT_CONFIG_DEADLINE
        if rec.get("failed"):
            continue
        measured += 1
        if rec.get("rate", 0) > best:
            best, best_cfg = rec["rate"], rec.get("config", "")
        state["rows"][rec.get("config", "")] = rec.get("rate", 0)
        state.update(best=best, cfg=best_cfg, measured=measured)

    if stalled_msg:
        print(f"bench: worker stalled ({stalled_msg}); killing pid "
              f"{proc.pid} and reporting best-so-far", file=sys.stderr)
        try:
            proc.send_signal(signal.SIGKILL)
        except OSError:
            pass

    if measured == 0:
        if worker_done and attempted > 0:
            print("bench: every (mode, batch) config failed — no measurement "
                  "(see FAILED lines above; this is NOT a backend stall)",
                  file=sys.stderr)
        elif eof_rc is not None:
            print(f"bench: worker exited rc={eof_rc} before any measurement "
                  "(worker crash — see stderr above; this is NOT a backend "
                  "stall)", file=sys.stderr)
        else:
            print("bench: no config completed before the deadline — backend "
                  "stalled mid-measurement", file=sys.stderr)
        sys.exit(1)
    _emit_headline(best, best_cfg, measured, args, size_tag, rows=state["rows"])


def bench_train(batch=32, iters=10, warmup=2, image_size=256):
    import jax
    import jax.numpy as jnp

    from msig_tpu.config import TrainConfig
    from msig_tpu.losses import init_vgg_params
    from msig_tpu.train import (
        Models, create_train_state, current_loss_weights, make_optimizers,
        make_train_step, weights_vector,
    )

    cfg = TrainConfig(image_size=image_size, batch_size=batch, compute_dtype="bfloat16")
    models = Models.from_config(cfg, num_domains=10, dtype=jnp.bfloat16)
    state = create_train_state(cfg, models, jax.random.PRNGKey(0))
    vgg = init_vgg_params()
    tx_g, tx_d = make_optimizers(cfg)
    env = os.environ
    bf = None if "BATCH_FORWARDS" not in env else env["BATCH_FORWARDS"] == "1"
    vp = None if "VGG_PAIR" not in env else env["VGG_PAIR"] == "1"
    gd = jnp.bfloat16 if env.get("GRAM_BF16") == "1" else jnp.float32
    step = jax.jit(make_train_step(models, tx_g, tx_d, cfg.ema_beta, jnp.bfloat16,
                                   batch_forwards=bf, vgg_pair=vp,
                                   gram_dtype=gd),
                   donate_argnums=(0,))
    rng = np.random.default_rng(0)
    batch_data = {
        "source": jax.device_put(rng.integers(0, 256, (batch, image_size, image_size, 3), dtype=np.uint8)),
        "target": jax.device_put(rng.integers(0, 256, (batch, image_size, image_size, 3), dtype=np.uint8)),
        "source_domain": jnp.zeros((batch,), jnp.int32),
        "target_domain": jnp.ones((batch,), jnp.int32),
    }
    w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)), jnp.float32)
    lr_g, lr_d = jnp.float32(2e-4), jnp.float32(1e-4)
    metrics = None
    for _ in range(warmup):
        state, metrics = step(state, batch_data, vgg, lr_g, lr_d, w)
    _sync(metrics["G_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data, vgg, lr_g, lr_d, w)
    _sync(metrics["G_loss"])
    ms = 1000 * (time.perf_counter() - t0) / iters
    return ms


def bench_data(n_images=256, image_size=256, threads=4):
    """Host input-pipeline throughput: decode + crop + rotate, img/s.

    Uses the native C++ loader when built (PIL fallback otherwise); measures
    the feeding capacity of THIS host (note: the build container has 1 CPU
    core; production TPU hosts have dozens).
    """
    import shutil
    import tempfile

    import numpy as np
    from PIL import Image

    from msig_tpu.data import TrainLoader, MultiDomainDataset
    from msig_tpu.data import native_loader

    tmp = tempfile.mkdtemp(prefix="msig_bench_data_")
    try:
        rng = np.random.default_rng(0)
        os.makedirs(f"{tmp}/src")
        os.makedirs(f"{tmp}/ref/D")
        for i in range(32):
            Image.fromarray(
                rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
            ).save(f"{tmp}/src/{i}.jpg", quality=90)
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
            ).save(f"{tmp}/ref/D/{i}.jpg", quality=90)
        ds = MultiDomainDataset.build(f"{tmp}/src", f"{tmp}/ref")
        loader = TrainLoader(ds, batch_size=16, image_size=image_size,
                             num_threads=threads)
        # warm
        next(iter(loader.epoch(0)))
        t0 = time.perf_counter()
        count = 0
        epoch = 1
        while count < n_images:
            for b in loader.epoch(epoch):
                count += 2 * b["source"].shape[0]  # source + target decodes
                if count >= n_images:
                    break
            epoch += 1
        dt = time.perf_counter() - t0
        print(f"  native_loader={'yes' if native_loader.available() else 'no (PIL)'}",
              file=sys.stderr)
        return count / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_e2e(n_images=512, image_size=256, quantize=True):
    """TRUE end-to-end inference: JPEG decode from disk -> engine -> host.

    Measures img/s through the full serving path (iter_input_batches decode
    prefetch + translate_batches), i.e. what a user of inference.py sees,
    unlike the device-resident headline. Inputs are copies of the bundled
    reference data when present, else synthetic JPEGs.
    """
    import shutil
    import tempfile

    import jax
    import numpy as np

    from PIL import Image

    from msig_tpu.config import InferenceConfig
    from msig_tpu.infer.engine import InferenceEngine
    from msig_tpu.models import MultiDomainStyleEncoder, StyleCycleGANGenerator

    tmp = tempfile.mkdtemp(prefix="msig_bench_e2e_")
    try:
        src = "/root/reference/data/src/Tomato_healthy"
        files = []
        if os.path.isdir(src):
            from msig_tpu.data import list_image_files

            # Only actual image files: a stray subdirectory or manifest in
            # the data dir would crash shutil.copy / shrink the decoded set.
            files = list_image_files(src)[: min(n_images, 1000)]
            for i, f in enumerate(files):
                shutil.copy(f, f"{tmp}/{i}.jpg")
            n = len(files)
        if not files:
            rng = np.random.default_rng(0)
            n = n_images
            for i in range(n):
                Image.fromarray(
                    rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
                ).save(f"{tmp}/{i}.jpg", quality=90)

        import jax.numpy as jnp

        cfg = InferenceConfig(image_size=image_size, batch_size=128,
                              quantize="int8" if quantize else None)
        gen = StyleCycleGANGenerator(style_dim=256, n_residual_blocks=8,
                                     dtype=jnp.bfloat16)
        se = MultiDomainStyleEncoder(style_dim=256, num_domains=10,
                                     dtype=jnp.bfloat16)
        img0 = jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16)
        gp = gen.init(jax.random.PRNGKey(0), img0, jnp.zeros((1, 256), jnp.bfloat16))
        sp = se.init(jax.random.PRNGKey(1), img0, jnp.zeros((1,), jnp.int32))
        eng = dataclasses.replace(InferenceEngine.build(cfg, 10, gp, sp),
                                  out_uint8=True)
        rng = np.random.default_rng(0)
        bank = jnp.asarray(rng.normal(0, 1, (10, 256)).astype(np.float32))

        def run_once():
            count = 0
            out_sum = 0.0
            for out, names in eng.translate_batches(
                eng.iter_input_batches(tmp), bank, "random", seed=0
            ):
                count += len(names)
                out_sum += float(np.asarray(out[0, 0, 0, 0]))  # host-side touch
            return count

        run_once()  # compile + warm page cache
        t0 = time.perf_counter()
        count = run_once()
        dt = time.perf_counter() - t0
        return count / dt, count
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["inference", "latency", "train", "data", "e2e"],
                    default="inference")
    ap.add_argument("--iters", type=int, default=40,
                    help="timing iterations (inference/train modes; e2e and "
                         "data modes measure a fixed workload). The device "
                         "sync is ONE scalar readback per timed block "
                         "(~26 ms through the tunnel); more iters amortize "
                         "that measurement overhead out of the per-batch "
                         "time (it is not chip work)")
    ap.add_argument("--image_size", type=int, default=256,
                    help="map size for inference/train modes (512 = BASELINE "
                         "config 5; smaller batches are auto-selected)")
    ap.add_argument("--train_batch", type=int, default=32)
    ap.add_argument("--batches", type=str, default="",
                    help="comma list of inference batch sizes to sweep "
                         "(default: 128,256 at <=256^2, 16,32 at 512^2)")
    ap.add_argument("--worker", action="store_true",
                    help="internal: run the measuring worker in-process "
                         "(no supervisor, no deadlines)")
    args = ap.parse_args()
    size_tag = str(args.image_size)

    if args.mode in ("inference", "latency") and not args.worker:
        # Supervisor path: deadlines + best-so-far live OUTSIDE the process
        # that talks to the device, so a stalled RPC can't swallow them.
        supervise_inference(args, size_tag)
        return

    # Worker / non-headline modes: device work happens in THIS process.
    # Persistent compile cache for every mode (the env var alone is not
    # honored by this jax build; the helper sets the config flags).
    import msig_tpu

    msig_tpu.enable_persistent_compile_cache()

    if args.mode == "e2e":
        rate, count = bench_e2e()
        print(json.dumps({
            "metric": "e2e_img_per_s_256_incl_decode",
            "value": round(rate, 1),
            "unit": "img/s",
            "vs_baseline": None,
        }))
        return

    if args.mode == "data":
        rate = bench_data()
        print(json.dumps({
            "metric": "input_pipeline_img_per_s_256",
            "value": round(rate, 1),
            "unit": "img/s/host",
            "vs_baseline": None,
        }))
        return

    if args.mode == "train":
        ms = bench_train(batch=args.train_batch, iters=args.iters,
                         image_size=args.image_size)
        print(json.dumps({
            "metric": f"train_step_ms_b{args.train_batch}_{size_tag}",
            "value": round(ms, 2),
            "unit": "ms",
            "vs_baseline": None,
        }))
        return

    if args.mode == "latency":
        # Small-batch latency sweep (int8 serving path only). Batches are
        # tiny, so the per-block sync RTT would dominate at the default
        # iter count — default to 100 iters unless --iters was given.
        batch_sizes = (tuple(int(b) for b in args.batches.split(","))
                       if args.batches else (1, 4, 16))
        lat_iters = args.iters if args.iters != 40 else 100
        run_inference_worker(batch_sizes=batch_sizes, iters=lat_iters,
                             image_size=args.image_size, modes=("int8",))
        return

    if args.batches:
        batch_sizes = tuple(int(b) for b in args.batches.split(","))
    else:
        batch_sizes = (128, 256) if args.image_size <= 256 else (16, 32)
    run_inference_worker(batch_sizes=batch_sizes, iters=args.iters,
                         image_size=args.image_size)


if __name__ == "__main__":
    main()
