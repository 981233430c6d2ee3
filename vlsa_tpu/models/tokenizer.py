"""Unified tokenizer facade over CLIP / HF-CLIP / CONCH vocabularies.

Behavioural port of ref model/utils_vl.py:19-81: returns token ids plus the
token count excluding <sot>/<eot>, and optionally strips <sot> and trailing
padding ("raw tokens") for prompt-embedding construction.
"""
from __future__ import annotations

import os
from typing import List, Union

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "tokenizers")
CONCH_TOKENIZER_JSON = os.path.join(ASSET_DIR, "conch_byte_level_bpe_uncased.json")


def get_conch_tokenizer():
    """CONCH byte-level BPE via transformers (vocab asset bundled)."""
    from transformers import PreTrainedTokenizerFast
    return PreTrainedTokenizerFast(
        tokenizer_file=CONCH_TOKENIZER_JSON,
        bos_token="<start_of_text>",
        eos_token="<end_of_text>",
        pad_token="<pad>",
    )


def conch_tokenize(tokenizer, texts: List[str]) -> np.ndarray:
    """127-token encode + one appended pad making room for the <cls> slot
    (ref model/conch/custom_tokenizer.py:21-32)."""
    tokens = tokenizer.batch_encode_plus(
        texts, max_length=127, add_special_tokens=True,
        return_token_type_ids=False, truncation=True,
        padding="max_length", return_tensors="np")["input_ids"]
    pad = np.full((tokens.shape[0], 1), tokenizer.pad_token_id, tokens.dtype)
    return np.concatenate([tokens, pad], axis=1)


class Tokenizer:
    """api in {'CLIP', 'HF', 'CONCH'} (ref model/utils_vl.py:19-81)."""

    def __init__(self, root=None, name=None, api: str = "CONCH",
                 context_length: int = 77):
        self.api = api
        self.pad_token_id = 0
        self.bos_token_id = 49406
        self.eos_token_id = 49407
        self.context_length = context_length  # CLIP api only
        if api == "CLIP":
            from .clip_bpe import ClipBPETokenizer
            self.tokenizer = ClipBPETokenizer()
        elif api == "HF":
            from transformers import AutoTokenizer
            path = os.path.join(root, name) if root else name
            self.tokenizer = AutoTokenizer.from_pretrained(path)
            self.pad_token_id = self.tokenizer.pad_token_id
            self.bos_token_id = self.tokenizer.bos_token_id
            self.eos_token_id = self.tokenizer.eos_token_id
        elif api == "CONCH":
            self.tokenizer = get_conch_tokenizer()
            self.pad_token_id = self.tokenizer.pad_token_id
            self.bos_token_id = self.tokenizer.bos_token_id
            self.eos_token_id = self.tokenizer.eos_token_id
        else:
            raise ValueError(f"Got an invalid api ({api}).")

    def __call__(self, text: Union[str, List[str]],
                 return_raw_tokens: bool = True, return_num_tokens: bool = True):
        single = isinstance(text, str)
        _text = [text] if single else list(text)

        if self.api == "CLIP":
            from .clip_bpe import clip_tokenize
            token_ids = clip_tokenize(self.tokenizer, _text,
                                      context_length=self.context_length)
        elif self.api == "HF":
            token_ids = self.tokenizer(_text, padding=True, return_tensors="np")["input_ids"]
        else:  # CONCH
            token_ids = conch_tokenize(self.tokenizer, _text)

        # <sot> and <eot> excluded from the token count (ref utils_vl.py:67-68)
        token_cnt = np.argmax((token_ids == self.eos_token_id).astype(np.int32), axis=-1) - 1

        if return_raw_tokens:
            max_cnt = int(token_cnt.max())
            token_ids = token_ids[:, 1:max_cnt + 1]

        if single:
            token_ids = token_ids[0]
            token_cnt = int(token_cnt[0])

        if return_num_tokens:
            return token_ids, token_cnt
        return token_ids
