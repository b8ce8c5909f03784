"""Model zoo: generators (5 variants), discriminator, text encoders."""

from vae_gan_mark_tpu.models.vaegan import VAEGANGenerator  # noqa: F401
from vae_gan_mark_tpu.models.discriminator import PatchDiscriminator  # noqa: F401
from vae_gan_mark_tpu.models.encoders import PlainEncoder, UNetEncoder  # noqa: F401
from vae_gan_mark_tpu.models.decoders import PlainDecoder, UNetStyleDecoder  # noqa: F401
from vae_gan_mark_tpu.models.text_encoders import (  # noqa: F401
    CharTextEncoder, CharTextEncoderPosEnc, SbertProjector)
