"""mmvae_tpu — a TPU-native JAX framework for VAEs on Moving MNIST.

A ground-up rebuild of the capabilities of ``praateekmahajan/moving-mnist-vae``
(see SURVEY.md; the reference mount is empty, so /root/repo/BASELINE.json is the
capability contract). Design is TPU-first:

- host-side double-buffered uint8 feed (`mmvae_tpu.data.feed`), with
  normalize/binarize fused on-device inside the jitted step,
- XLA convs + ``lax.scan`` over the time axis for the recurrent cores,
- a fused Pallas kernel for reparameterization sampling and the BCE+KL
  ELBO reduction (`mmvae_tpu.ops.elbo_pallas`),
- data-parallel training via ``shard_map`` over an ICI mesh
  (`mmvae_tpu.parallel.mesh`).

Five model configs (BASELINE.json:6-12):
  1. MLP VAE on single 64x64 frames          -> `mmvae_tpu.models.mlp_vae`
  2. Conv VAE per frame                       -> `mmvae_tpu.models.conv_vae`
  3. ConvLSTM sequence VAE on 20-frame clips  -> `mmvae_tpu.models.seq_vae`
  4. Seq VAE + next-frame prediction head     -> `mmvae_tpu.models.pred_vae`
  5. Hierarchical temporal-latent video VAE   -> `mmvae_tpu.models.hier_vae`
"""

__version__ = "0.1.0"
