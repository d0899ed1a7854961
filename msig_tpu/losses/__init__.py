"""Loss functions: LSGAN criteria + VGG19 perceptual style/content loss."""

from msig_tpu.losses.criteria import l1_loss, lsgan_fake, lsgan_real  # noqa: F401
from msig_tpu.losses.vgg import (  # noqa: F401
    get_vgg_params,
    init_vgg_params,
    load_vgg_params,
    style_content_loss,
    style_content_loss_pair,
    style_content_loss_pair2,
    vgg_features,
)
