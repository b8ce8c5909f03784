"""Core TPU-native ops: norms, conv blocks, RNN, pooling, resize, warp."""

from vae_gan_mark_tpu.ops.norms import (  # noqa: F401
    BatchNorm, InstanceNorm, SpectralConv, spectral_normalize)
from vae_gan_mark_tpu.ops.convblocks import (  # noqa: F401
    ConvBNRelu, DoubleConvBlock, TConv, TConvBNRelu, max_pool_2x2)
from vae_gan_mark_tpu.ops.rnn import BiGRU, GRULayer  # noqa: F401
from vae_gan_mark_tpu.ops.pool import adaptive_avg_pool1d  # noqa: F401
from vae_gan_mark_tpu.ops.resize import interpolate_bilinear  # noqa: F401
from vae_gan_mark_tpu.ops.film import (  # noqa: F401
    GatedSkip, SpatialFiLM, spatial_broadcast)
from vae_gan_mark_tpu.ops.sampling import kl_divergence, reparameterize  # noqa: F401
from vae_gan_mark_tpu.ops.warp import (  # noqa: F401
    perspective_crop_batch, perspective_unwarp, solve_homography)
