"""Model families (BASELINE.json:6-12), flax.linen, NHWC, scan over time.

All models share one functional interface (see `base.VAEOutput`): they take
preprocessed f32 frames plus an injected `sample_fn(mu, logvar) -> z` (so the
train step owns RNG and can route sampling through the fused Pallas kernel),
and return logits + the BCE target + posterior stats.
"""

from mmvae_tpu.models.base import VAEOutput
from mmvae_tpu.models.mlp_vae import MLPVAE
from mmvae_tpu.models.conv_vae import ConvVAE
from mmvae_tpu.models.convlstm import ConvLSTMCell
from mmvae_tpu.models.seq_vae import ConvLSTMSeqVAE
from mmvae_tpu.models.pred_vae import PredSeqVAE
from mmvae_tpu.models.hier_vae import HierVideoVAE

MODEL_REGISTRY = {
    "mlp_vae": MLPVAE,
    "conv_vae": ConvVAE,
    "seq_vae": ConvLSTMSeqVAE,
    "pred_vae": PredSeqVAE,
    "hier_vae": HierVideoVAE,
}

__all__ = [
    "VAEOutput",
    "MLPVAE",
    "ConvVAE",
    "ConvLSTMCell",
    "ConvLSTMSeqVAE",
    "PredSeqVAE",
    "HierVideoVAE",
    "MODEL_REGISTRY",
]
