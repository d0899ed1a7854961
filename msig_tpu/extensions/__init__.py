"""Extensions BEYOND reference parity — clearly flagged.

The reference implements none of these (verified in SURVEY.md §6 caveat:
no mapping network, no R1 penalty, no diversity loss). They exist here
because the build's north star mentions latent-guided synthesis and R1;
all are OFF by default so default behavior stays reference-parity.

  - :class:`MappingNetwork` — z -> per-domain style codes (latent-guided
    synthesis, StarGAN-v2-style shared MLP + per-domain heads).
  - :func:`r1_penalty` — R1 gradient penalty on real images for the
    discriminator (enable with ``TrainConfig.r1_gamma > 0``).
"""

from msig_tpu.extensions.mapping import MappingNetwork  # noqa: F401
from msig_tpu.extensions.r1 import r1_penalty  # noqa: F401
