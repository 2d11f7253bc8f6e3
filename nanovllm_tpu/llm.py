"""User-facing alias, parity with the reference (reference llm.py:15)."""

from nanovllm_tpu.engine.llm_engine import LLMEngine


class LLM(LLMEngine):
    pass
