"""nanovllm_tpu: a TPU-native (JAX/XLA/Pallas) LLM inference engine with the
capability set of nano-vllm-v1 (see SURVEY.md).

Public surface parity (reference nanovllm/__init__.py:14-15):
    from nanovllm_tpu import LLM, SamplingParams
"""

from nanovllm_tpu.llm import LLM
from nanovllm_tpu.sampling_params import SamplingParams

__all__ = ["LLM", "SamplingParams"]
