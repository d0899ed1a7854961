"""CLI flag-parity tests for main.py and inference.py (parsers only)."""

import json

import pytest

import main as train_cli
import inference as infer_cli
from msig_tpu.config import TrainConfig, default_experiment_name


class TestTrainCLI:
    def test_default_flags_match_reference_defaults(self):
        args = train_cli.build_arg_parser().parse_args([])
        assert args.source_dir == "./data/src/Tomato_Healthy"
        assert args.target_dir == "./data/ref2"
        assert args.epochs == 200
        assert args.image_size == 256
        assert args.batch_size == 4
        assert args.save_freq == 100
        assert args.lr_g == 2e-4
        assert args.lr_d == 1e-4
        assert json.loads(args.loss_weights) == {
            "gan": 1.0, "cycle": 10.0, "identity": 5.0, "content": 1.0, "style": 1.0
        }
        assert args.use_ema is True
        assert args.wandb is False

    def test_checkpoint_every_flag(self):
        """Default stays the reference's hard-coded 10-epoch cadence
        (reference trainer.py:355); the flag overrides it for long runs."""
        args = train_cli.build_arg_parser().parse_args([])
        assert train_cli.config_from_args(args).checkpoint_every == 10
        args = train_cli.build_arg_parser().parse_args(["--checkpoint_every", "50"])
        assert train_cli.config_from_args(args).checkpoint_every == 50

    def test_pallas_flag_tri_state(self):
        """Default must follow the measured config default
        (config.USE_PALLAS_ADAIN=False — the XLA path is faster on v5e);
        --pallas / --no_pallas force either way. Regression: the old
        `not args.no_pallas` polarity silently enabled the slower kernel
        on every stock run."""
        args = train_cli.build_arg_parser().parse_args([])
        assert train_cli.config_from_args(args).use_pallas is False
        args = train_cli.build_arg_parser().parse_args(["--pallas"])
        assert train_cli.config_from_args(args).use_pallas is True
        args = train_cli.build_arg_parser().parse_args(["--no_pallas"])
        assert train_cli.config_from_args(args).use_pallas is False

    def test_loss_weights_json_flag(self):
        args = train_cli.build_arg_parser().parse_args(
            ["--loss_weights", '{"gan": 2.0, "cycle": 1.0}']
        )
        cfg = train_cli.config_from_args(args)
        assert cfg.loss_weights == {"gan": 2.0, "cycle": 1.0}

    def test_auto_experiment_name(self):
        """Sorted-weights auto-name, dots as 'p' (reference main.py:139-144)."""
        name = default_experiment_name(
            {"gan": 1.0, "cycle": 10.0, "identity": 5.0, "content": 1.0, "style": 1.0}
        )
        assert name == (
            "multi_domain_content1p0_cycle10p0_gan1p0_identity5p0_style1p0"
        )
        cfg = TrainConfig(exp_name=None)
        assert cfg.experiment_name == name
        cfg2 = TrainConfig(exp_name="custom")
        assert cfg2.experiment_name == "custom"

    def test_refuses_silent_random_vgg(self, tmp_path):
        """No silent random-VGG training: without pretrained weights the CLI
        must fail loudly unless --allow_random_vgg is passed explicitly."""
        src = tmp_path / "src"
        trg = tmp_path / "trg"
        src.mkdir()
        trg.mkdir()
        base = ["--source_dir", str(src), "--target_dir", str(trg)]
        args = train_cli.build_arg_parser().parse_args(base)
        assert args.allow_random_vgg is False
        rc = train_cli.main(train_cli.config_from_args(args))
        assert rc == 1  # refused: no --vgg_weights, no --allow_random_vgg

        # A nonexistent weights file is also a hard error.
        args = train_cli.build_arg_parser().parse_args(
            base + ["--vgg_weights", str(tmp_path / "missing.npz")]
        )
        rc = train_cli.main(train_cli.config_from_args(args))
        assert rc == 1

    def test_use_ema_parses_falsy_strings(self):
        """The reference's type=bool flag bug (any string truthy) is fixed."""
        args = train_cli.build_arg_parser().parse_args(["--use_ema", "false"])
        assert args.use_ema is False
        args = train_cli.build_arg_parser().parse_args(["--use_ema", "true"])
        assert args.use_ema is True
        # ...and typos are REJECTED, not silently truthy ('flase' -> True
        # under the old lenient lambda)
        with pytest.raises(SystemExit):
            train_cli.build_arg_parser().parse_args(["--use_ema", "flase"])


class TestInferenceCLI:
    def test_default_flags_match_reference_defaults(self):
        args = infer_cli.build_arg_parser().parse_args([])
        assert args.input_dir == "./synthetic_target/Tomato_healthy"
        assert args.ref_domains_dir == "./data/ref"
        assert args.target_domain == "Tomato_Bacterial_spot"
        assert args.style_mode == "interpolate"
        assert args.noise_level == 0.1
        assert args.max_styles is None
        assert args.image_size == 256
        assert args.style_dim == 256
        assert args.save_grid is False

    def test_style_mode_choices(self):
        import pytest

        for mode in ("average", "random", "interpolate", "noise", "specific"):
            args = infer_cli.build_arg_parser().parse_args(["--style_mode", mode])
            assert args.style_mode == mode
        with pytest.raises(SystemExit):
            infer_cli.build_arg_parser().parse_args(["--style_mode", "bogus"])


def test_honor_jax_platforms_env_subprocess():
    """JAX_PLATFORMS=cpu must be authoritative even though this container's
    sitecustomize force-selects the tunneled TPU platform at interpreter
    start (docs/ROUND3.md 'Platform hygiene')."""
    import subprocess
    import sys

    code = (
        "import msig_tpu; msig_tpu.honor_jax_platforms_env(); "
        "import jax; print(jax.default_backend())"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().splitlines()[-1] == "cpu"

    # The bare package import must be enough (bench.py and every tools/
    # harness rely on this; none call honor_jax_platforms_env themselves).
    code = "import msig_tpu, jax; print(jax.default_backend())"
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().splitlines()[-1] == "cpu"
