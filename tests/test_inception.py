"""InceptionV3-pool3 parity: JAX forward vs an independent functional-torch
oracle, on a random state_dict with torchvision's EXACT key layout (which is
what tools/convert_inception_weights.py emits, so this also locks the npz
contract). torchvision itself is not installed in this environment — the
oracle mirrors torchvision's Inception3 eval forward (BasicConv2d =
bias-free conv + BN(eps=1e-3) + ReLU; blocks A/B/C/D/E; avg pools with
count_include_pad=True) functionally in torch."""

import numpy as np
import pytest

import torch
import torch.nn.functional as F

torch.manual_seed(0)


# ---------------- torchvision-layout random state_dict ----------------

def _bconv(sd, name, cin, cout, kh, kw):
    g = torch.Generator().manual_seed(abs(hash(name)) % (2**31))
    sd[f"{name}.conv.weight"] = torch.randn(cout, cin, kh, kw, generator=g) * 0.05
    sd[f"{name}.bn.weight"] = 1.0 + 0.1 * torch.randn(cout, generator=g)
    sd[f"{name}.bn.bias"] = 0.1 * torch.randn(cout, generator=g)
    sd[f"{name}.bn.running_mean"] = 0.1 * torch.randn(cout, generator=g)
    sd[f"{name}.bn.running_var"] = 1.0 + 0.1 * torch.randn(cout, generator=g).abs()
    sd[f"{name}.bn.num_batches_tracked"] = torch.tensor(0)


def _block_a(sd, n, cin, pool_features):
    _bconv(sd, f"{n}.branch1x1", cin, 64, 1, 1)
    _bconv(sd, f"{n}.branch5x5_1", cin, 48, 1, 1)
    _bconv(sd, f"{n}.branch5x5_2", 48, 64, 5, 5)
    _bconv(sd, f"{n}.branch3x3dbl_1", cin, 64, 1, 1)
    _bconv(sd, f"{n}.branch3x3dbl_2", 64, 96, 3, 3)
    _bconv(sd, f"{n}.branch3x3dbl_3", 96, 96, 3, 3)
    _bconv(sd, f"{n}.branch_pool", cin, pool_features, 1, 1)
    return 64 + 64 + 96 + pool_features


def _block_b(sd, n, cin):
    _bconv(sd, f"{n}.branch3x3", cin, 384, 3, 3)
    _bconv(sd, f"{n}.branch3x3dbl_1", cin, 64, 1, 1)
    _bconv(sd, f"{n}.branch3x3dbl_2", 64, 96, 3, 3)
    _bconv(sd, f"{n}.branch3x3dbl_3", 96, 96, 3, 3)
    return 384 + 96 + cin


def _block_c(sd, n, cin, c7):
    _bconv(sd, f"{n}.branch1x1", cin, 192, 1, 1)
    _bconv(sd, f"{n}.branch7x7_1", cin, c7, 1, 1)
    _bconv(sd, f"{n}.branch7x7_2", c7, c7, 1, 7)
    _bconv(sd, f"{n}.branch7x7_3", c7, 192, 7, 1)
    _bconv(sd, f"{n}.branch7x7dbl_1", cin, c7, 1, 1)
    _bconv(sd, f"{n}.branch7x7dbl_2", c7, c7, 7, 1)
    _bconv(sd, f"{n}.branch7x7dbl_3", c7, c7, 1, 7)
    _bconv(sd, f"{n}.branch7x7dbl_4", c7, c7, 7, 1)
    _bconv(sd, f"{n}.branch7x7dbl_5", c7, 192, 1, 7)
    _bconv(sd, f"{n}.branch_pool", cin, 192, 1, 1)
    return 192 * 4


def _block_d(sd, n, cin):
    _bconv(sd, f"{n}.branch3x3_1", cin, 192, 1, 1)
    _bconv(sd, f"{n}.branch3x3_2", 192, 320, 3, 3)
    _bconv(sd, f"{n}.branch7x7x3_1", cin, 192, 1, 1)
    _bconv(sd, f"{n}.branch7x7x3_2", 192, 192, 1, 7)
    _bconv(sd, f"{n}.branch7x7x3_3", 192, 192, 7, 1)
    _bconv(sd, f"{n}.branch7x7x3_4", 192, 192, 3, 3)
    return 320 + 192 + cin


def _block_e(sd, n, cin):
    _bconv(sd, f"{n}.branch1x1", cin, 320, 1, 1)
    _bconv(sd, f"{n}.branch3x3_1", cin, 384, 1, 1)
    _bconv(sd, f"{n}.branch3x3_2a", 384, 384, 1, 3)
    _bconv(sd, f"{n}.branch3x3_2b", 384, 384, 3, 1)
    _bconv(sd, f"{n}.branch3x3dbl_1", cin, 448, 1, 1)
    _bconv(sd, f"{n}.branch3x3dbl_2", 448, 384, 3, 3)
    _bconv(sd, f"{n}.branch3x3dbl_3a", 384, 384, 1, 3)
    _bconv(sd, f"{n}.branch3x3dbl_3b", 384, 384, 3, 1)
    _bconv(sd, f"{n}.branch_pool", cin, 192, 1, 1)
    return 320 + 768 + 768 + 192


def make_inception_sd():
    sd = {}
    _bconv(sd, "Conv2d_1a_3x3", 3, 32, 3, 3)
    _bconv(sd, "Conv2d_2a_3x3", 32, 32, 3, 3)
    _bconv(sd, "Conv2d_2b_3x3", 32, 64, 3, 3)
    _bconv(sd, "Conv2d_3b_1x1", 64, 80, 1, 1)
    _bconv(sd, "Conv2d_4a_3x3", 80, 192, 3, 3)
    c = _block_a(sd, "Mixed_5b", 192, 32)
    c = _block_a(sd, "Mixed_5c", c, 64)
    c = _block_a(sd, "Mixed_5d", c, 64)
    c = _block_b(sd, "Mixed_6a", c)
    c = _block_c(sd, "Mixed_6b", c, 128)
    c = _block_c(sd, "Mixed_6c", c, 160)
    c = _block_c(sd, "Mixed_6d", c, 160)
    c = _block_c(sd, "Mixed_6e", c, 192)
    # AuxLogits sits here in the real state_dict; the loader must skip it.
    sd["AuxLogits.conv0.conv.weight"] = torch.randn(128, c, 1, 1)
    c = _block_d(sd, "Mixed_7a", c)
    c = _block_e(sd, "Mixed_7b", c)
    c = _block_e(sd, "Mixed_7c", c)
    assert c == 2048
    return sd


# ---------------- functional torch oracle (eval mode) -----------------

def t_basic(sd, n, x, stride=1, padding=0):
    y = F.conv2d(x, sd[f"{n}.conv.weight"], None, stride, padding)
    y = F.batch_norm(y, sd[f"{n}.bn.running_mean"], sd[f"{n}.bn.running_var"],
                     sd[f"{n}.bn.weight"], sd[f"{n}.bn.bias"], False, 0.0, 1e-3)
    return F.relu(y)


def t_block_a(sd, n, x):
    b1 = t_basic(sd, f"{n}.branch1x1", x)
    b5 = t_basic(sd, f"{n}.branch5x5_2", t_basic(sd, f"{n}.branch5x5_1", x), padding=2)
    b3 = t_basic(sd, f"{n}.branch3x3dbl_1", x)
    b3 = t_basic(sd, f"{n}.branch3x3dbl_2", b3, padding=1)
    b3 = t_basic(sd, f"{n}.branch3x3dbl_3", b3, padding=1)
    bp = t_basic(sd, f"{n}.branch_pool", F.avg_pool2d(x, 3, 1, 1))
    return torch.cat([b1, b5, b3, bp], 1)


def t_block_b(sd, n, x):
    b3 = t_basic(sd, f"{n}.branch3x3", x, stride=2)
    bd = t_basic(sd, f"{n}.branch3x3dbl_1", x)
    bd = t_basic(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = t_basic(sd, f"{n}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def t_block_c(sd, n, x):
    b1 = t_basic(sd, f"{n}.branch1x1", x)
    b7 = t_basic(sd, f"{n}.branch7x7_1", x)
    b7 = t_basic(sd, f"{n}.branch7x7_2", b7, padding=(0, 3))
    b7 = t_basic(sd, f"{n}.branch7x7_3", b7, padding=(3, 0))
    bd = t_basic(sd, f"{n}.branch7x7dbl_1", x)
    bd = t_basic(sd, f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = t_basic(sd, f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = t_basic(sd, f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = t_basic(sd, f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = t_basic(sd, f"{n}.branch_pool", F.avg_pool2d(x, 3, 1, 1))
    return torch.cat([b1, b7, bd, bp], 1)


def t_block_d(sd, n, x):
    b3 = t_basic(sd, f"{n}.branch3x3_2", t_basic(sd, f"{n}.branch3x3_1", x), stride=2)
    b7 = t_basic(sd, f"{n}.branch7x7x3_1", x)
    b7 = t_basic(sd, f"{n}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = t_basic(sd, f"{n}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = t_basic(sd, f"{n}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def t_block_e(sd, n, x):
    b1 = t_basic(sd, f"{n}.branch1x1", x)
    b3 = t_basic(sd, f"{n}.branch3x3_1", x)
    b3 = torch.cat([t_basic(sd, f"{n}.branch3x3_2a", b3, padding=(0, 1)),
                    t_basic(sd, f"{n}.branch3x3_2b", b3, padding=(1, 0))], 1)
    bd = t_basic(sd, f"{n}.branch3x3dbl_1", x)
    bd = t_basic(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat([t_basic(sd, f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
                    t_basic(sd, f"{n}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
    bp = t_basic(sd, f"{n}.branch_pool", F.avg_pool2d(x, 3, 1, 1))
    return torch.cat([b1, b3, bd, bp], 1)


def t_inception_pool3(sd, x01):
    x = x01 * 2.0 - 1.0  # transform_input on ImageNet-normalized input
    x = t_basic(sd, "Conv2d_1a_3x3", x, stride=2)
    x = t_basic(sd, "Conv2d_2a_3x3", x)
    x = t_basic(sd, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = t_basic(sd, "Conv2d_3b_1x1", x)
    x = t_basic(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = t_block_a(sd, n, x)
    x = t_block_b(sd, "Mixed_6a", x)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = t_block_c(sd, n, x)
    x = t_block_d(sd, "Mixed_7a", x)
    for n in ("Mixed_7b", "Mixed_7c"):
        x = t_block_e(sd, n, x)
    return x.mean(dim=(2, 3))


# ------------------------------ tests ---------------------------------

def _npz_from_sd(sd, tmp_path):
    """Exactly what tools/convert_inception_weights.py writes."""
    out = {k.replace(".", "__"): v.numpy().astype(np.float32) for k, v in sd.items()}
    path = tmp_path / "inception_rand.npz"
    np.savez_compressed(path, **out)
    return str(path)


@pytest.mark.heavy
def test_pool3_parity_vs_functional_torch(tmp_path):
    from msig_tpu.eval.inception import inception_pool3, load_inception_params

    sd = make_inception_sd()
    # 128 px exercises every stride/pool/pad decision at ~5% of the 299 FLOPs
    x = torch.rand(2, 3, 128, 128)
    want = t_inception_pool3(sd, x).numpy()

    params = load_inception_params(_npz_from_sd(sd, tmp_path))
    import jax.numpy as jnp

    got = np.asarray(inception_pool3(
        {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in params.items()},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
    ))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_loader_skips_aux_and_counters(tmp_path):
    from msig_tpu.eval.inception import load_inception_params

    sd = make_inception_sd()
    params = load_inception_params(_npz_from_sd(sd, tmp_path))
    assert not any(k.startswith("AuxLogits") for k in params)
    assert params["Conv2d_1a_3x3"]["w"].shape == (3, 3, 3, 32)  # HWIO
    assert set(params["Mixed_7c.branch_pool"]) == {"w", "scale", "bias", "mean", "var"}


@pytest.mark.slow
def test_fid_between_dirs_with_inception(tmp_path):
    """End-to-end canonical-FID path: dirs of uint8 images -> scalar.
    FID(a, a) on identical dirs must be ~0; FID(a, b) > 0."""
    from PIL import Image

    from msig_tpu.eval import fid_between_dirs

    sd = make_inception_sd()
    npz = _npz_from_sd(sd, tmp_path)
    rng = np.random.default_rng(0)
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir(), db.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(da / f"{i}.png")
        Image.fromarray(rng.integers(100, 255, (64, 64, 3), dtype=np.uint8)).save(db / f"{i}.png")
    same = fid_between_dirs(str(da), str(da), image_size=64, batch_size=2,
                            inception_weights_path=npz)
    diff = fid_between_dirs(str(da), str(db), image_size=64, batch_size=2,
                            inception_weights_path=npz)
    assert abs(same) < 1e-3
    assert diff > same
