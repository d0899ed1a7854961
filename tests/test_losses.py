"""Loss parity tests: Gram semantics, VGG pipeline vs a torch re-implementation."""

import numpy as np

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from msig_tpu.losses import (
    init_vgg_params,
    l1_loss,
    lsgan_fake,
    lsgan_real,
    style_content_loss,
    vgg_features,
)
from msig_tpu.ops.gram import gram_matrix


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestGram:
    def test_batch_coupled_gram_matches_reference_semantics(self):
        """G = F @ F.T / (B*C*H*W) with F = reshape(NCHW, [B*C, H*W])."""
        x_nhwc = _rand(3, 5, 7, 4)
        got = np.asarray(gram_matrix(jnp.asarray(x_nhwc)))
        b, h, w, c = x_nhwc.shape
        f = np.transpose(x_nhwc, (0, 3, 1, 2)).reshape(b * c, h * w)
        want = (f @ f.T) / (b * c * h * w)
        assert got.shape == (b * c, b * c)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestCriteria:
    def test_lsgan(self):
        p = _rand(2, 4, 4, 1)
        np.testing.assert_allclose(
            float(lsgan_real(jnp.asarray(p))), float(np.mean((p - 1) ** 2)), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(lsgan_fake(jnp.asarray(p))), float(np.mean(p**2)), rtol=1e-6
        )

    def test_l1(self):
        a, b = _rand(2, 3), _rand(2, 3, seed=1)
        np.testing.assert_allclose(
            float(l1_loss(jnp.asarray(a), jnp.asarray(b))), float(np.mean(np.abs(a - b))), rtol=1e-6
        )


def _torch_vgg_prefix(params):
    """Torch mirror of the VGG prefix using OUR params, for structural parity."""
    convs = []
    for i in range(5):
        k = np.asarray(params[f"conv{i}"]["kernel"])  # HWIO
        b = np.asarray(params[f"conv{i}"]["bias"])
        convs.append((torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy()), torch.from_numpy(b)))
    return convs


def _torch_features(convs, img_nhwc, upto=5):
    """conv->relu chain with maxpool after conv2 and conv4, ImageNet-normalized."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)).copy())
    x = ((x + 1) / 2 - mean) / std
    feats = []
    for i, (w, b) in enumerate(convs[:upto]):
        x = torch.relu(F.conv2d(x, w, b, padding=1))
        feats.append(x)
        if i in (1, 3) and i + 1 < upto:
            x = F.max_pool2d(x, 2, 2)
    return feats


class TestVGG:
    def test_features_match_torch_pipeline(self):
        params = init_vgg_params(seed=7)
        img = np.clip(_rand(2, 32, 32, 3), -1, 1)
        got = vgg_features(params, jnp.asarray(img))
        want = _torch_features(_torch_vgg_prefix(params), img)
        assert len(got) == 5
        for g, t in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.transpose(t.numpy(), (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
            )

    def test_style_content_loss_values(self):
        """Full loss vs torch reference math (grams, L1s) with the same params."""
        params = init_vgg_params(seed=3)
        gen = np.clip(_rand(2, 32, 32, 3, seed=1), -1, 1)
        sty = np.clip(_rand(2, 32, 32, 3, seed=2), -1, 1)
        con = np.clip(_rand(2, 32, 32, 3, seed=3), -1, 1)
        content_loss, style_loss = style_content_loss(
            params, jnp.asarray(gen), jnp.asarray(sty), jnp.asarray(con)
        )

        convs = _torch_vgg_prefix(params)
        gen_f = _torch_features(convs, gen)
        sty_f = _torch_features(convs, sty)
        con_f = _torch_features(convs, con, upto=4)

        def t_gram(x):
            a, b, c, d = x.shape
            f = x.reshape(a * b, c * d)
            return (f @ f.t()) / (a * b * c * d)

        want_style = sum(
            F.l1_loss(t_gram(g), t_gram(s)).item() for g, s in zip(gen_f, sty_f)
        )
        want_content = F.l1_loss(gen_f[3], con_f[3]).item()
        np.testing.assert_allclose(float(style_loss), want_style, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(float(content_loss), want_content, rtol=1e-3, atol=1e-5)

    def test_content_only_needs_four_convs(self):
        params = init_vgg_params()
        img = np.clip(_rand(1, 16, 16, 3), -1, 1)
        f4 = vgg_features(params, jnp.asarray(img), upto=4)
        f5 = vgg_features(params, jnp.asarray(img), upto=5)
        np.testing.assert_allclose(np.asarray(f4[3]), np.asarray(f5[3]), rtol=1e-6)


def test_style_content_loss_pair_matches_two_calls():
    """One 4B-batched VGG forward == two 3-image calls (train-step fusion)."""
    import jax
    import numpy as np

    from msig_tpu.losses import init_vgg_params, style_content_loss
    from msig_tpu.losses.vgg import style_content_loss_pair

    vgg = init_vgg_params()
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
            for _ in range(4)]
    fake_B, real_B, real_A, fake_A = imgs

    cB, sB = style_content_loss(vgg, fake_B, real_B, real_A)
    cA, sA = style_content_loss(vgg, fake_A, real_A, real_B)
    (cB2, sB2), (cA2, sA2) = style_content_loss_pair(
        vgg, fake_B, real_B, real_A, fake_A)

    np.testing.assert_allclose(float(cB), float(cB2), rtol=1e-5)
    np.testing.assert_allclose(float(sB), float(sB2), rtol=1e-5)
    np.testing.assert_allclose(float(cA), float(cA2), rtol=1e-5)
    np.testing.assert_allclose(float(sA), float(sA2), rtol=1e-5)

    # The 2x2B-chunked pair (halved VGG liveness, b32 candidate) must
    # produce the same four losses as well.
    from msig_tpu.losses import style_content_loss_pair2

    (cB3, sB3), (cA3, sA3) = style_content_loss_pair2(
        vgg, fake_B, real_B, real_A, fake_A)
    np.testing.assert_allclose(float(cB), float(cB3), rtol=1e-5)
    np.testing.assert_allclose(float(sB), float(sB3), rtol=1e-5)
    np.testing.assert_allclose(float(cA), float(cA3), rtol=1e-5)
    np.testing.assert_allclose(float(sA), float(sA3), rtol=1e-5)
