"""selftoktokenizer_tpu — a TPU-native (JAX/XLA/Pallas) Selftok visual tokenizer framework.

A from-scratch reimplementation of the capabilities of the Selftok
("Self-Consistency Tokenizer") reference — a discrete visual tokenizer that
encodes an image into a 1-D sequence of K discrete token ids ordered by
reverse-diffusion timestep, with a 50-step rectified-flow diffusion decoder
and a one-step renderer — designed TPU-first:

* pure-functional models over explicit param pytrees (pjit/shard_map ready)
* fp32 encode path for bit-exact token-id conformance, bf16 decode path
* the 50-step sampler is a single jit-compiled ``lax.scan`` with a
  precomputed per-step token-mask table (the reference re-runs its encoder
  every step just to build this mask)
* Pallas kernels for the hot ops (flash attention, VQ distance+argmax)
* data parallelism via ``jax.sharding.Mesh`` with psum'd metrics; the VQ
  codebook EMA statistics reduce across the ``data`` axis in-graph.

Reference behavioural spec: /root/reference (selftok-team/SelftokTokenizer).
"""

__version__ = "0.1.0"

from selftoktokenizer_tpu.core.config import AttrDict, load_config  # noqa: F401
