"""Network architectures (flax.linen, NHWC)."""

from msig_tpu.models.networks import (  # noqa: F401
    AdaIN,
    AdaINResBlock,
    MultiDomainDiscriminator,
    MultiDomainStyleEncoder,
    StyleCycleGANGenerator,
)
