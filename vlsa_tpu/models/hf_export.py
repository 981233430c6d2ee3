"""Export an offline HuggingFace CLIPTokenizer from the bundled BPE assets.

The HF api path (ref model/utils_vl.py:30-36) loads `AutoTokenizer` from a
local directory; this utility materialises that directory (vocab.json,
merges.txt, tokenizer_config.json, special_tokens_map.json) from the same
`bpe_simple_vocab_16e6.txt.gz` the CLIP tokenizer uses, so the HF pipeline
runs with zero network access.
"""
from __future__ import annotations

import gzip
import json
import os

from .clip_bpe import DEFAULT_BPE_PATH, ClipBPETokenizer


def export_hf_clip_tokenizer(dst_dir: str, bpe_path: str = DEFAULT_BPE_PATH) -> str:
    os.makedirs(dst_dir, exist_ok=True)
    tok = ClipBPETokenizer(bpe_path)

    with open(os.path.join(dst_dir, "vocab.json"), "w") as f:
        json.dump(tok.encoder, f, ensure_ascii=False)

    merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
    merges = merges[1:49152 - 256 - 2 + 1]
    with open(os.path.join(dst_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(merges) + "\n")

    with open(os.path.join(dst_dir, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "CLIPTokenizer",
            "model_max_length": 77,
            "bos_token": "<|startoftext|>",
            "eos_token": "<|endoftext|>",
            "pad_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>",
        }, f)
    with open(os.path.join(dst_dir, "special_tokens_map.json"), "w") as f:
        json.dump({
            "bos_token": "<|startoftext|>",
            "eos_token": "<|endoftext|>",
            "pad_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>",
        }, f)
    return dst_dir
