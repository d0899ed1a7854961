"""Inference tests: style modes, batched engine, CLI end-to-end, exit codes."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from msig_tpu.config import InferenceConfig, TrainConfig
from msig_tpu.data import MultiDomainDataset
from msig_tpu.infer import InferenceEngine, sample_styles
from msig_tpu.train.trainer import Trainer


class TestStyleModes:
    def setup_method(self):
        self.bank = jnp.asarray(np.random.default_rng(0).standard_normal((6, 8)).astype(np.float32))
        self.key = jax.random.PRNGKey(0)

    def test_average_deterministic(self):
        out = sample_styles(self.bank, "average", self.key, 4)
        want = np.mean(np.asarray(self.bank), axis=0)
        for row in np.asarray(out):
            np.testing.assert_allclose(row, want, rtol=1e-6)

    def test_specific_is_first(self):
        out = sample_styles(self.bank, "specific", self.key, 3)
        for row in np.asarray(out):
            np.testing.assert_allclose(row, np.asarray(self.bank)[0], rtol=1e-6)

    def test_random_draws_bank_rows(self):
        out = np.asarray(sample_styles(self.bank, "random", self.key, 32))
        bank = np.asarray(self.bank)
        for row in out:
            assert any(np.allclose(row, b) for b in bank)

    def test_interpolate_convex_and_distinct(self):
        out = np.asarray(sample_styles(self.bank, "interpolate", self.key, 64))
        bank = np.asarray(self.bank)
        # every output lies within the bank's coordinate-wise min/max hull
        lo, hi = bank.min(0) - 1e-5, bank.max(0) + 1e-5
        assert (out >= lo).all() and (out <= hi).all()
        # not all identical (alpha varies)
        assert np.std(out, axis=0).max() > 1e-3

    def test_interpolate_single_vector_bank(self):
        bank1 = self.bank[:1]
        out = np.asarray(sample_styles(bank1, "interpolate", self.key, 4))
        for row in out:
            np.testing.assert_allclose(row, np.asarray(bank1)[0], rtol=1e-6)

    def test_noise_level_scales(self):
        big = np.asarray(sample_styles(self.bank, "noise", self.key, 256, noise_level=1.0))
        small = np.asarray(sample_styles(self.bank, "noise", self.key, 256, noise_level=0.01))
        bank = np.asarray(self.bank)

        def min_dist(rows):
            return np.mean([min(np.linalg.norm(r - b) for b in bank) for r in rows])

        assert min_dist(big) > 10 * min_dist(small)

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError):
            sample_styles(self.bank, "nope", self.key, 1)


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """Train 1 tiny epoch and return (checkpoint_dir, data_root, cfg)."""
    root = tmp_path_factory.mktemp("inf")
    rng = np.random.default_rng(0)
    src = root / "src"
    src.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(src / f"s{i}.jpg")
    ref = root / "ref"
    for d in ("DomA", "DomB"):
        (ref / d).mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(
                ref / d / f"r{i}.jpg"
            )
    cfg = TrainConfig(
        source_dir=str(src), target_dir=str(ref), save_dir_base=str(root / "results"),
        exp_name="t", epochs=1, image_size=32, batch_size=4, save_freq=10,
        style_dim=16, n_residual_blocks=1, checkpoint_every=1, use_pallas=False,
    )
    ds = MultiDomainDataset.build(cfg.source_dir, cfg.target_dir)
    tr = Trainer(cfg, ds)
    tr.train(0)
    ckpt = os.path.join(cfg.save_dir_base, "t", "checkpoints", "epoch_1")
    return ckpt, root, cfg


@pytest.mark.heavy
class TestInferenceCLI:
    def _icfg(self, trained_ckpt, out_name, **kw):
        ckpt, root, tcfg = trained_ckpt
        defaults = dict(
            input_dir=tcfg.source_dir,
            ref_domains_dir=tcfg.target_dir,
            checkpoint_dir=ckpt,
            output_dir=str(root / out_name),
            target_domain="DomA",
            image_size=32,
            style_dim=16,
            n_residual_blocks=1,
            batch_size=4,
            compute_dtype="float32",
            use_pallas=False,
        )
        defaults.update(kw)
        return InferenceConfig(**defaults)

    @pytest.mark.parametrize("mode", ["average", "random", "interpolate", "noise", "specific"])
    def test_all_style_modes_end_to_end(self, trained_ckpt, mode):
        import inference as cli

        cfg = self._icfg(trained_ckpt, f"out_{mode}", style_mode=mode)
        rc = cli.main(cfg)
        assert rc == 0
        outs = sorted(os.listdir(cfg.output_dir))
        assert outs == ["s0.jpg", "s1.jpg", "s2.jpg", "s3.jpg"]
        img = np.asarray(Image.open(os.path.join(cfg.output_dir, outs[0])))
        assert img.shape == (32, 32, 3)

    def test_bad_target_domain_raises(self, trained_ckpt):
        import inference as cli

        cfg = self._icfg(trained_ckpt, "out_bad", target_domain="Nope")
        assert cli.main(cfg) == 1  # clean message + exit 1, no traceback

    def test_corrupt_input_skipped(self, trained_ckpt, tmp_path):
        """A broken image is skipped, the rest process (inference.py:302-305)."""
        import shutil

        import inference as cli

        _, root, tcfg = trained_ckpt
        mixed = tmp_path / "mixed"
        mixed.mkdir()
        for f in sorted(os.listdir(tcfg.source_dir))[:2]:
            shutil.copy(os.path.join(tcfg.source_dir, f), mixed / f)
        (mixed / "broken.jpg").write_bytes(b"not an image at all")
        cfg = self._icfg(trained_ckpt, "out_corrupt", input_dir=str(mixed))
        assert cli.main(cfg) == 0
        outs = set(os.listdir(cfg.output_dir))
        assert "broken.jpg" not in outs
        assert len(outs) == 2

    def test_empty_input_dir_exit_code_1(self, trained_ckpt, tmp_path):
        import inference as cli

        empty = tmp_path / "empty"
        empty.mkdir()
        cfg = self._icfg(trained_ckpt, "out_empty", input_dir=str(empty))
        assert cli.main(cfg) == 1

    def test_int8_quantized_engine(self, trained_ckpt):
        import inference as cli

        cfg = self._icfg(trained_ckpt, "out_int8", quantize="int8", style_mode="average")
        assert cli.main(cfg) == 0
        assert len(os.listdir(cfg.output_dir)) == 4
        # int8 and fp32 outputs visually close (same checkpoint, same mode)
        ref_cfg = self._icfg(trained_ckpt, "out_int8_ref", style_mode="average")
        assert cli.main(ref_cfg) == 0
        a = np.asarray(Image.open(os.path.join(cfg.output_dir, "s0.jpg")), dtype=np.float32)
        b = np.asarray(Image.open(os.path.join(ref_cfg.output_dir, "s0.jpg")), dtype=np.float32)
        assert np.mean(np.abs(a - b)) < 12.0  # small perceptual delta in u8 space

    def test_save_grid_writes_comparison(self, trained_ckpt):
        import inference as cli

        cfg = self._icfg(trained_ckpt, "out_grid", save_grid=True, style_mode="specific")
        assert cli.main(cfg) == 0
        assert os.path.exists(os.path.join(cfg.output_dir, "style_modes_grid.png"))

    def test_partial_batch_padding(self, trained_ckpt):
        """4 inputs with batch 8 -> one padded batch, still 4 outputs."""
        import inference as cli

        cfg = self._icfg(trained_ckpt, "out_pad", batch_size=8)
        assert cli.main(cfg) == 0
        assert len(os.listdir(cfg.output_dir)) == 4

    def test_save_grid_with_data_parallel(self, trained_ckpt, tmp_path):
        """--save_grid slices one image out of a mesh-staged batch; the
        slice must re-enter the staging path as a host array (a committed
        device slice carries a replicated sharding that the engine jit's
        in_shardings reject). Regression: crashed on multi-device hosts.
        Needs >= batch_size inputs so the FIRST batch is full and therefore
        device-staged with the mesh sharding (partial batches stay host-side)."""
        import shutil

        import inference as cli

        ckpt, root, tcfg = trained_ckpt
        big_in = tmp_path / "grid_dp_inputs"
        big_in.mkdir()
        srcs = sorted(os.listdir(tcfg.source_dir))
        for k in range(8):
            shutil.copy(os.path.join(tcfg.source_dir, srcs[k % len(srcs)]),
                        big_in / f"in{k}.jpg")
        cfg = self._icfg(trained_ckpt, "out_grid_dp", save_grid=True,
                         style_mode="specific", batch_size=8,
                         data_parallel=True, input_dir=str(big_in))
        assert cli.main(cfg) == 0
        assert os.path.exists(os.path.join(cfg.output_dir,
                                           "style_modes_grid.png"))
        assert len(os.listdir(cfg.output_dir)) == 9  # 8 outputs + grid


@pytest.mark.heavy
class TestLatentGuided:
    def test_latent_mode_end_to_end(self, trained_ckpt, tmp_path):
        """EXTENSION: z ~ N(0,1) -> MappingNetwork -> generator."""
        import jax
        import jax.numpy as jnp
        from flax import serialization

        import inference as cli
        from msig_tpu.extensions import MappingNetwork

        # save random mapping params in the CLI's expected format
        mod = MappingNetwork(latent_dim=4, style_dim=16, num_domains=3)
        params = mod.init(jax.random.PRNGKey(3), jnp.zeros((1, 4)),
                          jnp.zeros((1,), jnp.int32))
        mp = tmp_path / "mapping.msgpack"
        mp.write_bytes(serialization.to_bytes(params))

        ckpt, root, tcfg = trained_ckpt
        cfg = InferenceConfig(
            input_dir=tcfg.source_dir,
            ref_domains_dir=tcfg.target_dir,
            checkpoint_dir=ckpt,
            output_dir=str(tmp_path / "out_latent"),
            target_domain="DomA",
            image_size=32,
            style_dim=16,
            n_residual_blocks=1,
            batch_size=4,
            compute_dtype="float32",
            use_pallas=False,
            style_mode="latent",
            mapping_params=str(mp),
            latent_dim=4,
        )
        assert cli.main(cfg) == 0
        assert len(os.listdir(cfg.output_dir)) == 4

    def test_latent_without_mapping_raises(self, trained_ckpt, tmp_path):
        import pytest

        import inference as cli

        _, root, tcfg = trained_ckpt
        cfg = InferenceConfig(
            input_dir=tcfg.source_dir,
            ref_domains_dir=tcfg.target_dir,
            checkpoint_dir=trained_ckpt[0],
            output_dir=str(tmp_path / "out_nolatent"),
            target_domain="DomA",
            image_size=32, style_dim=16, n_residual_blocks=1,
            batch_size=4, compute_dtype="float32", use_pallas=False,
            style_mode="latent",
        )
        with pytest.raises(ValueError):
            cli.main(cfg)


@pytest.mark.heavy
class TestTorchCheckpointInference:
    def test_reference_format_checkpoint(self, trained_ckpt, tmp_path):
        """A torch-format checkpoint dir drops straight into the CLI."""
        import torch

        from tests.test_torch_import import make_disc_sd, make_gen_sd, make_se_sd

        import inference as cli

        ckpt_dir = tmp_path / "torch_ckpt"
        ckpt_dir.mkdir()
        torch.save(
            {
                "G_A2B": make_gen_sd(), "G_B2A": make_gen_sd(),
                "SE_A": make_se_sd(), "SE_B": make_se_sd(),
                "D_A": make_disc_sd(), "D_B": make_disc_sd(),
                "num_domains": 3,
            },
            ckpt_dir / "checkpoint.pth",
        )
        _, root, tcfg = trained_ckpt
        cfg = InferenceConfig(
            input_dir=tcfg.source_dir,
            ref_domains_dir=tcfg.target_dir,
            checkpoint_dir=str(ckpt_dir),
            output_dir=str(tmp_path / "out_torch"),
            target_domain="DomB",
            image_size=32,
            style_dim=16,
            n_residual_blocks=2,
            batch_size=4,
            compute_dtype="float32",
            use_pallas=False,
        )
        assert cli.main(cfg) == 0
        assert len(os.listdir(cfg.output_dir)) == 4


@pytest.mark.heavy
class TestMultiDomainServing:
    """EXTENSION: --target_domain 'all' / comma-list, one compiled program."""

    def test_all_domains_one_invocation(self, trained_ckpt):
        import inference as cli

        ckpt, root, tcfg = trained_ckpt
        cfg = InferenceConfig(
            input_dir=tcfg.source_dir, ref_domains_dir=tcfg.target_dir,
            checkpoint_dir=ckpt, output_dir=str(root / "out_multi"),
            target_domain="all", image_size=32, style_dim=16,
            n_residual_blocks=1, batch_size=4, compute_dtype="float32",
            use_pallas=False, style_mode="specific",
        )
        assert cli.main(cfg) == 0
        for d in ("DomA", "DomB"):
            outs = sorted(os.listdir(os.path.join(cfg.output_dir, d)))
            assert outs == ["s0.jpg", "s1.jpg", "s2.jpg", "s3.jpg"]

    def test_multi_matches_single_domain_run(self, trained_ckpt):
        """Per-domain outputs of a multi-domain run == single-domain runs."""
        import inference as cli

        ckpt, root, tcfg = trained_ckpt
        base = dict(
            input_dir=tcfg.source_dir, ref_domains_dir=tcfg.target_dir,
            checkpoint_dir=ckpt, image_size=32, style_dim=16,
            n_residual_blocks=1, batch_size=4, compute_dtype="float32",
            use_pallas=False, style_mode="specific",
        )
        assert cli.main(InferenceConfig(
            output_dir=str(root / "out_list"), target_domain="DomA,DomB",
            **base)) == 0
        assert cli.main(InferenceConfig(
            output_dir=str(root / "out_single_b"), target_domain="DomB",
            **base)) == 0
        a = np.asarray(Image.open(root / "out_list" / "DomB" / "s0.jpg"),
                       dtype=np.float32)
        b = np.asarray(Image.open(root / "out_single_b" / "s0.jpg"),
                       dtype=np.float32)
        assert np.mean(np.abs(a - b)) < 1.0  # identical modulo JPEG encode

    def test_empty_domain_list_raises(self, trained_ckpt):
        """',' / whitespace parses to zero domains -> clear error, not
        IndexError."""
        import inference as cli

        ckpt, root, tcfg = trained_ckpt
        cfg = InferenceConfig(
            input_dir=tcfg.source_dir, ref_domains_dir=tcfg.target_dir,
            checkpoint_dir=ckpt, output_dir=str(root / "out_emptylist"),
            target_domain=",", image_size=32, style_dim=16,
            n_residual_blocks=1, batch_size=4, compute_dtype="float32",
            use_pallas=False,
        )
        assert cli.main(cfg) == 1

    def test_unknown_domain_in_list_raises(self, trained_ckpt):
        import inference as cli

        ckpt, root, tcfg = trained_ckpt
        cfg = InferenceConfig(
            input_dir=tcfg.source_dir, ref_domains_dir=tcfg.target_dir,
            checkpoint_dir=ckpt, output_dir=str(root / "out_badlist"),
            target_domain="DomA,Nope", image_size=32, style_dim=16,
            n_residual_blocks=1, batch_size=4, compute_dtype="float32",
            use_pallas=False,
        )
        assert cli.main(cfg) == 1


class TestInputIterator:
    """iter_input_batches lifecycle: early close stops the producer thread;
    host_tee + iter_host_batches replay the decode exactly once."""

    def _bare_engine(self, batch_size=2, image_size=32):
        # iter_input_batches touches only image_size/batch_size/mesh.
        return InferenceEngine(
            generator=None, style_encoder=None, gen_params={}, se_params={},
            image_size=image_size, batch_size=batch_size,
        )

    def _inputs(self, tmp_path, n=7):
        rng = np.random.default_rng(3)
        d = tmp_path / "it_in"
        d.mkdir()
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
            ).save(d / f"i{i}.png")
        return str(d)

    def test_early_close_stops_producer(self, tmp_path):
        import threading
        import time

        eng = self._bare_engine(batch_size=1)  # 7 batches, queue maxsize 2
        before = set(threading.enumerate())
        it = eng.iter_input_batches(self._inputs(tmp_path))
        assert next(it, None) is not None
        it.close()  # abandon after 1 of 7 batches
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
            if not leaked:
                break
            time.sleep(0.05)
        assert not leaked, f"producer/pool threads leaked: {leaked}"

    def test_slow_consumer_receives_all_batches_and_terminates(self, tmp_path):
        """Consumer slower than decode (the case prefetch exists for): the
        producer finishes while the queue is FULL. The end-of-input sentinel
        must still arrive — a put_nowait there drops it and the consumer
        blocks on q.get() forever (regression test)."""
        import threading
        import time

        eng = self._bare_engine(batch_size=1)
        got, done = [], threading.Event()

        def consume():
            for _, names in eng.iter_input_batches(self._inputs(tmp_path), prefetch=1):
                got.extend(names)
                time.sleep(0.25)  # let the producer run ahead and finish
            done.set()

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        assert done.wait(30), "consumer hung waiting for the end sentinel"
        assert len(got) == 7

    def test_host_tee_and_replay(self, tmp_path):
        eng = self._bare_engine(batch_size=3)
        src = self._inputs(tmp_path)  # 7 imgs -> batches of 3, 3, 1
        tee = []
        live = [(np.asarray(a), n) for a, n in
                eng.iter_input_batches(src, host_tee=tee)]
        assert [len(n) for _, n in live] == [3, 3, 1]
        assert len(tee) == len(live)
        replay = [(np.asarray(a), n) for a, n in eng.iter_host_batches(tee)]
        for (a0, n0), (a1, n1) in zip(live, replay):
            assert n0 == n1
            np.testing.assert_array_equal(a0, a1)
