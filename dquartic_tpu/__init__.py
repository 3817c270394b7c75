"""dquartic_tpu — TPU-native diffusion deconvolution of DIA-MS/MS data.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Roestlab/diffusion-deconvolution-dia-msms-data ("dquartic", D^4): a DDIM
diffusion model that deconvolutes multiplexed DIA MS2 maps conditioned on
MS1 signals, plus the surrounding data pipeline, trainer, sampler, CLI and
config system.

Design notes (vs. the PyTorch reference at /root/reference):
  * All device compute is functional JAX: the denoisers are flax.linen
    modules, the DDIM forward/reverse processes are pure functions, the
    full reverse pass compiles to a single `lax.scan` program, and the
    training step is one jitted, donated update.
  * Parallelism is expressed with `jax.sharding.Mesh` + NamedSharding
    (data-parallel batch axis, optional tensor-parallel axis for the wide
    bottleneck convolutions) instead of any torch.distributed analogue.
  * Hot attention paths can dispatch to Pallas TPU kernels (ops/).
  * Host-side data handling uses numpy/pyarrow streaming instead of
    per-item DuckDB point queries (reference dquartic/utils/data_loader.py:163-178).
"""

__version__ = "0.1.0"

from . import core, models

__all__ = ["core", "models", "__version__"]
