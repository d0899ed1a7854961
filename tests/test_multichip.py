"""Multi-chip (virtual 8-device CPU mesh) tests: shardings + DP equivalence."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from msig_tpu.parallel import make_mesh, replicate, shard_batch
from msig_tpu.parallel.mesh import batch_sharding, data_mesh_for_batch


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.shape == (8,)
        assert mesh.axis_names == ("data",)

    def test_data_mesh_for_batch_divisibility(self):
        assert data_mesh_for_batch(8).devices.shape == (8,)
        assert data_mesh_for_batch(4).devices.shape == (4,)
        assert data_mesh_for_batch(6).devices.shape == (6,)
        assert data_mesh_for_batch(1) is None

    def test_shard_batch_layout(self):
        mesh = make_mesh()
        batch = {"source": np.zeros((8, 4, 4, 3), np.uint8)}
        sharded = shard_batch(mesh, batch)
        assert sharded["source"].sharding == batch_sharding(mesh)

    def test_replicate(self):
        mesh = make_mesh()
        tree = {"w": np.ones((3, 3), np.float32)}
        rep = replicate(mesh, tree)
        assert rep["w"].sharding.is_fully_replicated


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        jax.eval_shape(fn, *args)  # traces/compile-checks without running 256^2 on CPU

    @pytest.mark.heavy
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestDataParallelEquivalence:
    @pytest.mark.heavy
    def test_sharded_step_matches_single_device(self):
        """One fused step on an 8-device mesh == the same step on one device."""
        from msig_tpu.config import TrainConfig
        from msig_tpu.losses import init_vgg_params
        from msig_tpu.parallel import jit_train_step
        from msig_tpu.train import (
            Models, create_train_state, current_loss_weights, make_optimizers,
            make_train_step, weights_vector,
        )

        cfg = TrainConfig(image_size=32, batch_size=8, style_dim=16,
                          n_residual_blocks=1, use_pallas=False)
        models = Models.from_config(cfg, num_domains=3)
        state0 = create_train_state(cfg, models, jax.random.PRNGKey(0))
        vgg = init_vgg_params()
        tx_g, tx_d = make_optimizers(cfg)
        raw_step = make_train_step(models, tx_g, tx_d, cfg.ema_beta)

        rng = np.random.default_rng(0)
        batch = {
            "source": rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8),
            "target": rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8),
            "source_domain": np.zeros((8,), np.int32),
            "target_domain": rng.integers(1, 3, (8,), dtype=np.int32),
        }
        w = jnp.asarray(weights_vector(current_loss_weights(cfg.loss_weights, 0)), jnp.float32)
        args = (jnp.float32(2e-4), jnp.float32(1e-4), w)

        # single device (no donation so state0 survives for the second run)
        single = jax.jit(raw_step)
        s1, m1 = single(state0, batch, vgg, *args)

        mesh = make_mesh()
        state_r = replicate(mesh, create_train_state(cfg, models, jax.random.PRNGKey(0)))
        sharded = jit_train_step(raw_step, mesh)
        s2, m2 = sharded(state_r, shard_batch(mesh, batch), replicate(mesh, vgg), *args)

        for k in m1:
            np.testing.assert_allclose(
                float(jax.device_get(m1[k])), float(jax.device_get(m2[k])),
                rtol=2e-3, atol=1e-4, err_msg=k,
            )
        # parameters after the step agree across the two programs
        a = jax.tree.leaves(jax.device_get(s1.gen_params))[0]
        b = jax.tree.leaves(jax.device_get(s2.gen_params))[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


class TestDataParallelInference:
    """Serving DP: params replicated, batch split over the 1-D mesh.

    The bf16/fp32 path is GSPMD-partitioned via jit in_shardings; the int8
    path runs per-shard under shard_map. Both must match the single-device
    engine exactly (per-sample nets: no cross-batch math anywhere).
    """

    def _engines(self, quantize=None):
        from msig_tpu.config import InferenceConfig
        from msig_tpu.infer import InferenceEngine
        from msig_tpu.models import MultiDomainStyleEncoder, StyleCycleGANGenerator

        rng = jax.random.PRNGKey(0)
        gen = StyleCycleGANGenerator(style_dim=16, n_residual_blocks=1, use_pallas=False)
        se = MultiDomainStyleEncoder(style_dim=16, num_domains=2)
        img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        style = jnp.zeros((1, 16), jnp.float32)
        gp = gen.init(rng, img, style)
        sp = se.init(rng, img, jnp.zeros((1,), jnp.int32))

        def build(dp):
            cfg = InferenceConfig(
                image_size=32, style_dim=16, n_residual_blocks=1, batch_size=8,
                compute_dtype="float32", use_pallas=False, quantize=quantize,
                data_parallel=dp,
            )
            return InferenceEngine.build(cfg, 2, gp, sp)

        return build(False), build(True)

    def _run(self, eng, imgs):
        bank = jnp.asarray(
            np.random.default_rng(7).standard_normal((4, 16)).astype(np.float32))
        out, names = next(eng.translate_batches(
            iter([(imgs, [f"i{k}" for k in range(imgs.shape[0])])]),
            bank, "average", seed=3))
        return out

    def test_fp32_path_matches_single_device(self):
        single, dp = self._engines()
        assert dp.mesh is not None and dp.mesh.devices.size == 8
        imgs = np.random.default_rng(1).integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
        np.testing.assert_allclose(
            self._run(single, imgs.copy()), self._run(dp, imgs.copy()),
            rtol=1e-5, atol=1e-5)

    @pytest.mark.heavy
    def test_int8_path_matches_single_device(self):
        single, dp = self._engines(quantize="int8")
        assert dp.mesh is not None
        imgs = np.random.default_rng(2).integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
        np.testing.assert_allclose(
            self._run(single, imgs.copy()), self._run(dp, imgs.copy()),
            rtol=1e-4, atol=1e-4)

    @pytest.mark.heavy
    def test_int8_fused_pallas_path_under_shard_map(self):
        """The SHIPPED serving config — fused int8 Pallas kernels — under
        shard_map on the virtual 8-mesh (VERDICT r4 #6).

        use_pallas=True forces the all-Pallas generator body (fused encoder
        -> trunk -> decoder) in Pallas interpret mode on the CPU devices;
        256^2 is the shape the kernel grid is built for. Must match the
        single-device run of the same kernels exactly (per-sample nets).
        """
        from msig_tpu.config import InferenceConfig
        from msig_tpu.infer import InferenceEngine
        from msig_tpu.models import MultiDomainStyleEncoder, StyleCycleGANGenerator

        rng = jax.random.PRNGKey(0)
        gen = StyleCycleGANGenerator(style_dim=16, n_residual_blocks=1, use_pallas=False)
        se = MultiDomainStyleEncoder(style_dim=16, num_domains=2)
        img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        style = jnp.zeros((1, 16), jnp.float32)
        gp = gen.init(rng, img, style)
        sp = se.init(rng, img, jnp.zeros((1,), jnp.int32))

        def build(dp):
            cfg = InferenceConfig(
                image_size=256, style_dim=16, n_residual_blocks=1, batch_size=8,
                compute_dtype="float32", use_pallas=True, quantize="int8",
                data_parallel=dp,
            )
            return InferenceEngine.build(cfg, 2, gp, sp)

        single, dp = build(False), build(True)
        assert dp.mesh is not None and dp.mesh.devices.size == 8
        imgs = np.random.default_rng(5).integers(
            0, 256, (8, 256, 256, 3), dtype=np.uint8)
        a = self._run(single, imgs.copy())
        b = self._run(dp, imgs.copy())
        assert np.isfinite(np.asarray(a, np.float32)).all()
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_partial_batch_on_mesh(self):
        """5 images with batch 8 on the mesh: padded on device, 5 outputs."""
        _, dp = self._engines()
        imgs = np.random.default_rng(3).integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)
        out = self._run(dp, imgs)
        assert out.shape == (5, 32, 32, 3)
        assert np.isfinite(out).all()
