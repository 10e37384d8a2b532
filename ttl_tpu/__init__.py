"""ttl_tpu: TPU-native Test-Time Low-rank adaptation framework.

A from-scratch JAX/XLA re-design of the capabilities of
Razaimam45/TTL-Test-Time-Low-Rank-Adaptation (arXiv:2407.15913): episodic
per-sample LoRA adaptation of CLIP under a confidence-maximization objective,
compiled as a single jit program and batched across test samples and chips.
"""
from .config import TTLConfig  # noqa: F401

__version__ = "0.1.0"
