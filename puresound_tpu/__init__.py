"""puresound_tpu — a TPU-native speech enhancement / source separation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the PureSound
toolkit (reference: mcw519/PureSound): noise suppression (NS), target
speech extraction (TSE, incl. personal VAD), and distance-based speech
separation (DSS), built TPU-first:

- All recurrences are `lax.scan`; all hot ops are large batched matmuls that
  map onto the MXU (conv-STFT/iSTFT as framed matmuls, LSTM gates as fused
  input projections, dual-path chunking as [N*S] batching).
- Streaming inference is a stateful jitted step function with an explicit
  state pytree, batched over concurrent streams (with a Pallas kernel
  keeping per-stream state VMEM-resident).
- Scaling is expressed with `jax.sharding.Mesh` + pjit (data-parallel batch
  sharding with XLA all-reduce), not host-side replication.

Public surface (lazy imports to keep `import puresound_tpu` light):
    puresound_tpu.zoo            — named model configs + loss factories
    puresound_tpu.nnet           — encoders, backbones, losses, wrappers
    puresound_tpu.streaming      — StreamingTSE/NS/DSS engines, stream_signal, to_half
    puresound_tpu.parallel       — mesh, TrainState, sharded train step
    puresound_tpu.tasks          — datasets, loaders, trainers
    puresound_tpu.src            — audio IO, augmentation, metrics
"""

__version__ = "0.1.0"

__all__ = ["zoo", "nnet", "streaming", "parallel", "tasks", "src", "dsp",
           "ops", "utils"]
