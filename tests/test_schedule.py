"""Schedule parity: cosine LR vs torch CosineAnnealingLR, weight warmup/decay."""

import numpy as np
import torch

from msig_tpu.train.schedule import (
    WEIGHT_KEYS,
    cosine_lr,
    current_loss_weights,
    loss_weight_factor,
    weights_vector,
)


class TestCosineLR:
    def test_matches_torch_cosine_annealing(self):
        base, total, eta_min = 2e-4, 200, 1e-6
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total, eta_min=eta_min)
        for epoch in range(total):
            want = sched.get_last_lr()[0]
            got = cosine_lr(base, epoch, total, eta_min)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)
            opt.step()
            sched.step()


class TestWeightScheduler:
    def test_warmup_phase(self):
        # warmup factor = min(1, (epoch+1)/10); decay starts at epoch 10
        assert loss_weight_factor(0) == (1) / 10
        assert loss_weight_factor(4) == 5 / 10
        assert loss_weight_factor(9) == 1.0

    def test_zero_warmup_disables_warmup(self):
        # warmup_epochs=0 means "no warmup", not ZeroDivisionError
        np.testing.assert_allclose(loss_weight_factor(0, warmup_epochs=0), 1.0)
        # decay then starts immediately: epoch 50, progress 0.5 -> 0.55
        np.testing.assert_allclose(loss_weight_factor(50, warmup_epochs=0), 0.55)

    def test_decay_phase(self):
        # epoch 10: progress 0 -> decay 1.0
        np.testing.assert_allclose(loss_weight_factor(10), 1.0)
        # epoch 60: progress 0.5 -> cosine 0.5 -> decay 0.1+0.9*0.5 = 0.55
        np.testing.assert_allclose(loss_weight_factor(60), 0.55)
        # epoch >= 110: progress 1 -> decay floor 0.1
        np.testing.assert_allclose(loss_weight_factor(110), 0.1)
        np.testing.assert_allclose(loss_weight_factor(199), 0.1)

    def test_reference_formula_over_all_epochs(self):
        """Replicate utils.py:110-134 directly and compare every epoch."""
        for epoch in range(200):
            warmup = min(1.0, (epoch + 1) / 10)
            decay = 1.0
            if epoch >= 10:
                progress = min(1.0, (epoch - 10) / 100)
                decay = 0.1 + 0.9 * (0.5 * (1 + np.cos(np.pi * progress)))
            np.testing.assert_allclose(loss_weight_factor(epoch), warmup * decay, rtol=1e-12)

    def test_weights_vector_order(self):
        w = current_loss_weights({"gan": 1.0, "cycle": 10.0, "identity": 5.0,
                                  "content": 1.0, "style": 1.0}, epoch=9)
        vec = weights_vector(w)
        assert WEIGHT_KEYS == ["gan", "cycle", "identity", "content", "style"]
        np.testing.assert_allclose(vec, [1.0, 10.0, 5.0, 1.0, 1.0])
