"""Tokenizer layer: HF-backed for LLaMA vocabularies, plus a self-contained
character tokenizer for tests/fixtures (no network, no model files).

Special-token wiring mirrors utils/create_from_pretrained.py:148-273:
always add <sc> and <pad>; in instruct mode add the six prompt/speech/
response delimiters; ids are appended after the base vocab in this order so
configs line up:  [base_vocab] <pad> <sc> <bos_prompt> <eos_prompt>
<bos_speech> <eos_speech> <bos_response> <eos_response>.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

INSTRUCT_SPECIALS = ("<bos_prompt>", "<eos_prompt>", "<bos_speech>",
                     "<eos_speech>", "<bos_response>", "<eos_response>")


@dataclass
class SpecialTokens:
    pad_token_id: int
    sc_token_id: int
    bos_token_id: int
    eos_token_id: int
    bosp_token_id: Optional[int] = None
    eosp_token_id: Optional[int] = None
    boss_token_id: Optional[int] = None
    eoss_token_id: Optional[int] = None
    bosr_token_id: Optional[int] = None
    eosr_token_id: Optional[int] = None


class CharTokenizer:
    """Char-level tokenizer with the same special-token contract. Vocab:
    [<bos>=0? no] — layout: 0:<unk> 1:<bos> 2:<eos> 3:' ' 4..: chars,
    then specials appended by add_special_tokens()."""

    def __init__(self, alphabet: str = "abcdefghijklmnopqrstuvwxyz'0123456789"):
        self.vocab: Dict[str, int] = {"<unk>": 0, "<bos>": 1, "<eos>": 2,
                                      " ": 3}
        for ch in alphabet:
            self.vocab[ch] = len(self.vocab)
        self.inv = {v: k for k, v in self.vocab.items()}
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id: Optional[int] = None
        self.specials: Dict[str, int] = {}

    def __len__(self):
        return len(self.vocab)

    @property
    def base_vocab_size(self) -> int:
        return len(self.vocab) - len(self.specials)

    def add_special_tokens(self, instruct: bool = False) -> SpecialTokens:
        def add(tok):
            if tok not in self.vocab:
                self.vocab[tok] = len(self.vocab)
                self.inv[self.vocab[tok]] = tok
                self.specials[tok] = self.vocab[tok]
            return self.vocab[tok]
        pad = add("<pad>")
        sc = add("<sc>")
        self.pad_token_id = pad
        ids = {}
        if instruct:
            for name, tok in zip(("bosp", "eosp", "boss", "eoss", "bosr",
                                  "eosr"), INSTRUCT_SPECIALS):
                ids[f"{name}_token_id"] = add(tok)
        return SpecialTokens(pad_token_id=pad, sc_token_id=sc,
                             bos_token_id=self.bos_token_id,
                             eos_token_id=self.eos_token_id, **ids)

    def _match_special(self, text: str, i: int) -> Optional[str]:
        if text[i] != "<":
            return None
        j = text.find(">", i)
        if j < 0:
            return None
        tok = text[i:j + 1]
        return tok if tok in self.vocab and tok.startswith("<") else None

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = [self.bos_token_id] if add_bos else []
        i = 0
        while i < len(text):
            sp = self._match_special(text, i)
            if sp is not None:
                ids.append(self.vocab[sp])
                i += len(sp)
                continue
            ids.append(self.vocab.get(text[i], 0))
            i += 1
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        out = []
        special_ids = {self.vocab[t] for t in self.specials} | {0, 1, 2}
        for t in ids:
            t = int(t)
            if skip_special_tokens and t in special_ids:
                continue
            out.append(self.inv.get(t, ""))
        return "".join(out)

    def __call__(self, text: str):
        class _Enc:
            def __init__(s, ids):
                s.input_ids = ids
        return _Enc(self.encode(text))

    def save(self, path: str) -> None:
        import json
        with open(path, "w") as f:
            json.dump({"type": "char", "vocab": self.vocab,
                       "specials": self.specials,
                       "pad_token_id": self.pad_token_id}, f)

    @classmethod
    def load(cls, path: str) -> "CharTokenizer":
        import json
        with open(path) as f:
            d = json.load(f)
        tok = cls.__new__(cls)
        tok.vocab = d["vocab"]
        tok.inv = {v: k for k, v in tok.vocab.items()}
        tok.specials = d["specials"]
        tok.bos_token_id = 1
        tok.eos_token_id = 2
        tok.pad_token_id = d["pad_token_id"]
        return tok


def load_tokenizer(model_dir_or_name: str):
    """Tokenizer resolution: a saved char tokenizer json inside a model dir,
    else an HF tokenizer dir (reference src/tokenizer_loader.py)."""
    import os
    char_path = os.path.join(model_dir_or_name, "char_tokenizer.json")
    if os.path.exists(char_path):
        return CharTokenizer.load(char_path)
    if os.path.isfile(model_dir_or_name) and model_dir_or_name.endswith(".json"):
        return CharTokenizer.load(model_dir_or_name)
    return HFTokenizer(model_dir_or_name)


class HFTokenizer:
    """Wrapper over a local HF tokenizer (LLaMA). No hub access — path must
    exist on disk (reference src/tokenizer_loader.py:41)."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.bos_token_id = self.tok.bos_token_id
        self.eos_token_id = self.tok.eos_token_id
        self.pad_token_id = self.tok.pad_token_id

    def __len__(self):
        return len(self.tok)

    def add_special_tokens(self, instruct: bool = False) -> SpecialTokens:
        toks = ["<pad>", "<sc>"]
        if instruct:
            toks += list(INSTRUCT_SPECIALS)
        self.tok.add_special_tokens(
            {"pad_token": "<pad>",
             "additional_special_tokens": [t for t in toks if t != "<pad>"]})
        self.pad_token_id = self.tok.pad_token_id
        get = lambda t: self.tok.convert_tokens_to_ids(t)
        ids = {}
        if instruct:
            for name, tok in zip(("bosp", "eosp", "boss", "eoss", "bosr",
                                  "eosr"), INSTRUCT_SPECIALS):
                ids[f"{name}_token_id"] = get(tok)
        return SpecialTokens(pad_token_id=get("<pad>"), sc_token_id=get("<sc>"),
                             bos_token_id=self.bos_token_id,
                             eos_token_id=self.eos_token_id, **ids)

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = self.tok(text).input_ids
        if not add_bos and ids and ids[0] == self.bos_token_id:
            ids = ids[1:]
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        return self.tok.decode([int(i) for i in ids],
                               skip_special_tokens=skip_special_tokens)

    def __call__(self, text: str):
        return self.tok(text)


def build_prompt_and_input(prompt: str, response: str):
    """utils/instruction_template_utils.py:14-41, verbatim template."""
    prompt_str = (f"<bos_prompt>{prompt}<eos_prompt><bos_speech>"
                  f"<eos_speech><bos_response>")
    input_str = f"{response}<eos_response>"
    return prompt_str, input_str
