"""Per-request sampling configuration.

Capability parity with the reference engine's SamplingParams
(reference: nanovllm/sampling_params.py:20-45): temperature, max_tokens,
ignore_eos.  Unlike the reference (which asserts temperature > 1e-10 and
forbids greedy), we additionally allow ``temperature == 0.0`` meaning greedy
argmax decoding — needed for deterministic tests and perplexity-style evals.
"""

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False

    def __post_init__(self):
        if self.temperature < 0.0:
            raise ValueError("temperature must be >= 0 (0 means greedy)")
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
