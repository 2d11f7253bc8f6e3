"""Offline generation example (the reference example.py equivalent).

With a real checkpoint directory:   python example.py /path/to/Qwen3-0.6B
Without one (this machine has no weights / no egress): runs the flagship
geometry with random weights and token-id prompts, just to show the API.
"""

import sys


def main():
    from nanovllm_tpu import LLM, SamplingParams

    if len(sys.argv) > 1:
        path = sys.argv[1]
        llm = LLM(path, max_model_len=4096)
        tok = llm.tokenizer
        prompts = [
            tok.apply_chat_template(
                [{"role": "user", "content": content}],
                tokenize=False,
                add_generation_prompt=True,
            )
            for content in [
                "introduce yourself",
                "list all prime numbers within 20",
            ]
        ]
        sp = SamplingParams(temperature=0.6, max_tokens=256)
        outputs = llm.generate(prompts, sp)
        for prompt, out in zip(prompts, outputs):
            print("\n=== prompt ===\n" + prompt)
            print("=== completion ===\n" + out["text"])
    else:
        from __graft_entry__ import QWEN3_0_6B, _hf_cfg

        llm = LLM(
            hf_config=_hf_cfg(**dict(QWEN3_0_6B, layers=4)),
            random_weights=True,
            max_model_len=4096,
            max_num_seqs=8,
        )
        sp = SamplingParams(temperature=0.6, max_tokens=32, ignore_eos=True)
        outputs = llm.generate([[1, 2, 3, 4, 5], [42, 43, 44]], sp)
        for out in outputs:
            print("token_ids:", out["token_ids"])


if __name__ == "__main__":
    main()
