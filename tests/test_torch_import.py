"""Torch-checkpoint import parity: reference-format state_dicts -> our params.

Builds random state_dicts with the reference's exact key layout, computes the
reference forward pass *functionally* in torch (instance norm, AdaIN, reflect
pad, conv-transpose, branch gather), imports the weights through
msig_tpu.compat, and checks our networks produce the same outputs. This is
the proof that a user can carry reference-trained checkpoints into this
framework unchanged.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from msig_tpu.compat import (
    import_discriminator,
    import_generator,
    import_style_encoder,
)
from msig_tpu.models import (
    MultiDomainDiscriminator,
    MultiDomainStyleEncoder,
    StyleCycleGANGenerator,
)

torch.manual_seed(0)
N_RES, SDIM, NDOM = 2, 16, 3


def _t(shape):
    return torch.randn(*shape) * 0.1


# ---------------- random reference-format state_dicts ----------------

def make_gen_sd(n_res=N_RES, sdim=SDIM):
    sd = {}
    sd["content_encoder.0.weight"], sd["content_encoder.0.bias"] = _t((64, 3, 7, 7)), _t((64,))
    sd["content_encoder.3.weight"], sd["content_encoder.3.bias"] = _t((128, 64, 4, 4)), _t((128,))
    sd["content_encoder.6.weight"], sd["content_encoder.6.bias"] = _t((256, 128, 4, 4)), _t((256,))
    for i in range(n_res):
        sd[f"decoder.{i}.conv1.weight"], sd[f"decoder.{i}.conv1.bias"] = _t((256, 256, 3, 3)), _t((256,))
        sd[f"decoder.{i}.conv2.weight"], sd[f"decoder.{i}.conv2.bias"] = _t((256, 256, 3, 3)), _t((256,))
        for a in ("adain1", "adain2"):
            sd[f"decoder.{i}.{a}.style_modulation.weight"] = _t((512, sdim))
            sd[f"decoder.{i}.{a}.style_modulation.bias"] = _t((512,))
    sd[f"decoder.{n_res}.weight"], sd[f"decoder.{n_res}.bias"] = _t((256, 128, 4, 4)), _t((128,))
    sd[f"decoder.{n_res + 3}.weight"], sd[f"decoder.{n_res + 3}.bias"] = _t((128, 64, 4, 4)), _t((64,))
    sd[f"decoder.{n_res + 6}.weight"], sd[f"decoder.{n_res + 6}.bias"] = _t((3, 64, 7, 7)), _t((3,))
    return sd


def make_se_sd(ndom=NDOM, sdim=SDIM):
    sd = {}
    for i, (cin, cout) in zip((0, 2, 4, 6), [(3, 64), (64, 128), (128, 256), (256, 512)]):
        sd[f"shared_layers.{i}.weight"], sd[f"shared_layers.{i}.bias"] = _t((cout, cin, 4, 4)), _t((cout,))
    for d in range(ndom):
        sd[f"domain_branches.{d}.0.weight"] = _t((sdim, 512, 1, 1))
        sd[f"domain_branches.{d}.0.bias"] = _t((sdim,))
    return sd


def make_disc_sd(ndom=NDOM):
    sd = {}
    for i, (cin, cout) in zip((0, 2, 5, 8), [(3, 64), (64, 128), (128, 256), (256, 512)]):
        sd[f"shared_layers.{i}.weight"], sd[f"shared_layers.{i}.bias"] = _t((cout, cin, 4, 4)), _t((cout,))
    for d in range(ndom):
        sd[f"domain_branches.{d}.1.weight"] = _t((1, 512, 4, 4))
        sd[f"domain_branches.{d}.1.bias"] = _t((1,))
    return sd


# ---------------- functional torch forward (reference semantics) -----

def t_adain(x, style, w, b):
    h = F.instance_norm(x)
    params = F.linear(style, w, b)
    gamma, beta = params.chunk(2, dim=1)
    return gamma[:, :, None, None] * h + beta[:, :, None, None]


def t_gen_forward(sd, x, style, n_res=N_RES):
    x = F.conv2d(F.pad(x, (3, 3, 3, 3), mode="reflect"),
                 sd["content_encoder.0.weight"], sd["content_encoder.0.bias"])
    x = F.relu(F.instance_norm(x))
    x = F.relu(F.instance_norm(F.conv2d(x, sd["content_encoder.3.weight"],
                                        sd["content_encoder.3.bias"], 2, 1)))
    x = F.relu(F.instance_norm(F.conv2d(x, sd["content_encoder.6.weight"],
                                        sd["content_encoder.6.bias"], 2, 1)))
    for i in range(n_res):
        h = F.conv2d(x, sd[f"decoder.{i}.conv1.weight"], sd[f"decoder.{i}.conv1.bias"], 1, 1)
        h = F.relu(t_adain(h, style, sd[f"decoder.{i}.adain1.style_modulation.weight"],
                           sd[f"decoder.{i}.adain1.style_modulation.bias"]))
        h = F.conv2d(h, sd[f"decoder.{i}.conv2.weight"], sd[f"decoder.{i}.conv2.bias"], 1, 1)
        h = t_adain(h, style, sd[f"decoder.{i}.adain2.style_modulation.weight"],
                    sd[f"decoder.{i}.adain2.style_modulation.bias"])
        x = h + x
    x = F.relu(F.instance_norm(F.conv_transpose2d(
        x, sd[f"decoder.{n_res}.weight"], sd[f"decoder.{n_res}.bias"], 2, 1)))
    x = F.relu(F.instance_norm(F.conv_transpose2d(
        x, sd[f"decoder.{n_res + 3}.weight"], sd[f"decoder.{n_res + 3}.bias"], 2, 1)))
    x = F.conv2d(F.pad(x, (3, 3, 3, 3), mode="reflect"),
                 sd[f"decoder.{n_res + 6}.weight"], sd[f"decoder.{n_res + 6}.bias"])
    return torch.tanh(x)


def t_se_forward(sd, x, domain_idx, ndom=NDOM):
    for i in (0, 2, 4, 6):
        x = F.relu(F.conv2d(x, sd[f"shared_layers.{i}.weight"], sd[f"shared_layers.{i}.bias"], 2, 1))
    x = F.adaptive_avg_pool2d(x, 1)
    outs = [F.conv2d(x, sd[f"domain_branches.{d}.0.weight"],
                     sd[f"domain_branches.{d}.0.bias"]).flatten(1) for d in range(ndom)]
    all_outputs = torch.stack(outs, dim=1)
    return all_outputs[torch.arange(x.shape[0]), domain_idx]


def t_disc_forward(sd, x, domain_idx, ndom=NDOM):
    x = F.leaky_relu(F.conv2d(x, sd["shared_layers.0.weight"], sd["shared_layers.0.bias"], 2, 1), 0.2)
    for i in (2, 5, 8):
        x = F.leaky_relu(F.instance_norm(
            F.conv2d(x, sd[f"shared_layers.{i}.weight"], sd[f"shared_layers.{i}.bias"], 2, 1)), 0.2)
    outs = [F.conv2d(F.pad(x, (1, 0, 1, 0)), sd[f"domain_branches.{d}.1.weight"],
                     sd[f"domain_branches.{d}.1.bias"], padding=1) for d in range(ndom)]
    all_outputs = torch.stack(outs, dim=1)
    return all_outputs[torch.arange(x.shape[0]), domain_idx]


def _nhwc(t):
    return jnp.asarray(np.transpose(t.numpy(), (0, 2, 3, 1)))


class TestImportParity:
    def test_generator(self):
        sd = make_gen_sd()
        x = torch.randn(2, 3, 32, 32)
        style = torch.randn(2, SDIM)
        want = t_gen_forward(sd, x, style).numpy()
        params = import_generator({k: v.numpy() for k, v in sd.items()}, N_RES)
        mod = StyleCycleGANGenerator(style_dim=SDIM, n_residual_blocks=N_RES)
        got = np.asarray(mod.apply(params, _nhwc(x), jnp.asarray(style.numpy())))
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4)

    def test_style_encoder(self):
        sd = make_se_sd()
        x = torch.randn(2, 3, 32, 32)
        idx = torch.tensor([1, 2])
        want = t_se_forward(sd, x, idx).numpy()
        params = import_style_encoder({k: v.numpy() for k, v in sd.items()}, NDOM, SDIM)
        mod = MultiDomainStyleEncoder(style_dim=SDIM, num_domains=NDOM)
        got = np.asarray(mod.apply(params, _nhwc(x), jnp.asarray(idx.numpy())))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_discriminator(self):
        sd = make_disc_sd()
        x = torch.randn(2, 3, 64, 64)
        idx = torch.tensor([0, 2])
        want = t_disc_forward(sd, x, idx).numpy()
        params = import_discriminator({k: v.numpy() for k, v in sd.items()}, NDOM)
        mod = MultiDomainDiscriminator(num_domains=NDOM)
        got = np.asarray(mod.apply(params, _nhwc(x), jnp.asarray(idx.numpy())))
        np.testing.assert_allclose(
            got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
        )
