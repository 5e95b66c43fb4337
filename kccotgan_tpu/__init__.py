"""kccotgan_tpu — a TPU-native Kernel Conditional COT-GAN framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference implementation (neuripss2020/kccotgan): conditional video
prediction trained with a causal (adapted) optimal-transport Sinkhorn
divergence, a scale-invariant martingale penalty, and optional Gaussian
kernel smoothing of discriminator inputs.

Layer map (TPU-first):
  ot/        causal-OT cost + log-domain Sinkhorn (pure-JAX scan + fused Pallas)
  models/    ConvLSTM encoder pyramid, U-Net ConvLSTM decoder, discriminators
  smoothing/ separable Gaussian kernel smoothing (1d/2d/3d) + sigma annealing
  data/      host-side pipelines (MMNIST npy, GQN/BAIR TFRecord, KTH/Penn)
  train/     train state, jitted disc/gen steps, loop, rollout sampler
  eval/      video-prediction metrics (PSNR/SSIM, best-of-K protocol)
  parallel/  mesh + shard_map data parallelism, all-gather global Sinkhorn
  ckpt/      Orbax checkpointing of the full train state
  config/    dataclass configs + per-dataset presets
  cli/       entry point mirroring the reference flag surface
"""

__version__ = "0.1.0"
