"""WER / cpWER scoring with the reference scorer's semantics
(/root/reference/utils/compute-wer.py):

* Levenshtein alignment with cor=0/sub=1/del=1/ins=1 costs and the same
  traceback preference order (del < ins < diag at equal cost — the reference
  scans del, then ins, then diagonal, keeping strict '<')
* char mode: CJK chars as units, punctuation dropped, <tags> kept whole
  (characterize, compute-wer.py:15-46)
* tag stripping + optional case folding + ignore list (normalize, :64-84)
* Overall -> WER% N C S D I summary line (:436-553)

Plus cpWER: concatenated minimum-permutation WER across K speaker streams
(the multi-talker headline metric; not in the reference repo, whose papers
report it — computed here by scoring all K! stream assignments and taking
the minimum).
"""
from __future__ import annotations

import itertools
import unicodedata
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

PUNCTS = set("!,?、。！，；？：「」︰『』《》")
SPACELIST = {" ", "\t", "\r", "\n"}


def characterize(string: str) -> List[str]:
    res: List[str] = []
    i = 0
    while i < len(string):
        char = string[i]
        if char in PUNCTS:
            i += 1
            continue
        cat1 = unicodedata.category(char)
        if cat1 in ("Zs", "Cn") or char in SPACELIST:
            i += 1
            continue
        if cat1 == "Lo":
            res.append(char)
            i += 1
        else:
            sep = ">" if char == "<" else " "
            j = i + 1
            while j < len(string):
                c = string[j]
                if ord(c) >= 128 or c in SPACELIST or c == sep:
                    break
                j += 1
            if j < len(string) and string[j] == ">":
                j += 1
            res.append(string[i:j])
            i = j
    return res


def stripoff_tags(x: str) -> str:
    chars = []
    i = 0
    while i < len(x):
        if x[i] == "<":
            while i < len(x) and x[i] != ">":
                i += 1
            i += 1
        else:
            chars.append(x[i])
            i += 1
    return "".join(chars)


def normalize_tokens(tokens: Sequence[str], ignore_words=frozenset(),
                     case_sensitive: bool = False,
                     remove_tag: bool = True) -> List[str]:
    out = []
    for token in tokens:
        x = token
        if not case_sensitive:
            x = x.upper()
        if x in ignore_words:
            continue
        if remove_tag:
            x = stripoff_tags(x)
        if x:
            out.append(x)
    return out


def tokenize(text: str, char_mode: bool = False) -> List[str]:
    return characterize(text) if char_mode else text.split()


@dataclass
class EditStats:
    all: int = 0
    cor: int = 0
    sub: int = 0
    dele: int = 0
    ins: int = 0
    lab_align: List[str] = field(default_factory=list)
    rec_align: List[str] = field(default_factory=list)

    @property
    def errors(self) -> int:
        return self.sub + self.dele + self.ins

    @property
    def wer(self) -> float:
        return 100.0 * self.errors / max(self.all, 1)

    def add(self, other: "EditStats") -> None:
        self.all += other.all
        self.cor += other.cor
        self.sub += other.sub
        self.dele += other.dele
        self.ins += other.ins


def align(lab: Sequence[str], rec: Sequence[str]) -> EditStats:
    """Edit-distance alignment with the reference's cost/preference order."""
    n, m = len(lab), len(rec)
    INF = 1 << 30
    dist = [[0] * (m + 1) for _ in range(n + 1)]
    err = [["non"] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        dist[i][0] = i
        err[i][0] = "del"
    for j in range(1, m + 1):
        dist[0][j] = j
        err[0][j] = "ins"
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            best, bestE = INF, "none"
            d = dist[i - 1][j] + 1
            if d < best:
                best, bestE = d, "del"
            d = dist[i][j - 1] + 1
            if d < best:
                best, bestE = d, "ins"
            if lab[i - 1] == rec[j - 1]:
                d = dist[i - 1][j - 1]
                e = "cor"
            else:
                d = dist[i - 1][j - 1] + 1
                e = "sub"
            if d < best:
                best, bestE = d, e
            dist[i][j], err[i][j] = best, bestE

    stats = EditStats()
    i, j = n, m
    while not (i == 0 and j == 0):
        e = err[i][j]
        if e == "cor":
            stats.all += 1
            stats.cor += 1
            stats.lab_align.insert(0, lab[i - 1])
            stats.rec_align.insert(0, rec[j - 1])
            i, j = i - 1, j - 1
        elif e == "sub":
            stats.all += 1
            stats.sub += 1
            stats.lab_align.insert(0, lab[i - 1])
            stats.rec_align.insert(0, rec[j - 1])
            i, j = i - 1, j - 1
        elif e == "del":
            stats.all += 1
            stats.dele += 1
            stats.lab_align.insert(0, lab[i - 1])
            stats.rec_align.insert(0, "")
            i -= 1
        else:  # ins
            stats.ins += 1
            stats.lab_align.insert(0, "")
            stats.rec_align.insert(0, rec[j - 1])
            j -= 1
    return stats


class Calculator:
    """Accumulating scorer matching the reference Calculator's interface.

    The O(n*m) alignment runs in the native C++ kernel
    (native/wer_kernel.cpp via utils/native.py) when available and alignment
    strings are not needed; falls back to the pure-Python path (identical
    cost model) otherwise."""

    def __init__(self, char_mode: bool = False, case_sensitive: bool = False,
                 ignore_words: Optional[set] = None, use_native: bool = True):
        self.char_mode = char_mode
        self.case_sensitive = case_sensitive
        self.ignore_words = set(ignore_words or ())
        if not case_sensitive:
            self.ignore_words = {w.upper() for w in self.ignore_words}
        self.total = EditStats()
        self.per_utt: Dict[str, EditStats] = {}
        self.use_native = use_native
        self._vocab: Dict[str, int] = {}

    def _prep(self, text: str) -> List[str]:
        return normalize_tokens(tokenize(text, self.char_mode),
                                self.ignore_words, self.case_sensitive)

    def _ids(self, tokens: Sequence[str]) -> List[int]:
        out = []
        for t in tokens:
            if t not in self._vocab:
                self._vocab[t] = len(self._vocab)
            out.append(self._vocab[t])
        return out

    def calculate(self, utt_id: str, lab_text: str, rec_text: str,
                  need_alignment: bool = False) -> EditStats:
        lab, rec = self._prep(lab_text), self._prep(rec_text)
        stats = None
        if self.use_native and need_alignment:
            # native DP + traceback ops; alignment strings rebuilt host-side
            # so the DEFAULT verbose scoring path (compute-wer --v=1,
            # run.sh:316-319) runs the C++ kernel too
            from mtasr_tpu.utils.native import wer_align_ops_native
            res = wer_align_ops_native(self._ids(lab), self._ids(rec))
            if res is not None:
                counts, ops = res
                stats = EditStats(all=counts[0], cor=counts[1],
                                  sub=counts[2], dele=counts[3],
                                  ins=counts[4])
                i = j = 0
                for op in ops:
                    if op in (1, 2):      # cor / sub
                        stats.lab_align.append(lab[i])
                        stats.rec_align.append(rec[j])
                        i, j = i + 1, j + 1
                    elif op == 3:         # del
                        stats.lab_align.append(lab[i])
                        stats.rec_align.append("")
                        i += 1
                    else:                 # ins
                        stats.lab_align.append("")
                        stats.rec_align.append(rec[j])
                        j += 1
        elif self.use_native:
            from mtasr_tpu.utils.native import wer_align_native
            counts = wer_align_native(self._ids(lab), self._ids(rec))
            if counts is not None:
                stats = EditStats(all=counts[0], cor=counts[1],
                                  sub=counts[2], dele=counts[3],
                                  ins=counts[4])
        if stats is None:
            stats = align(lab, rec)
        self.per_utt[utt_id] = stats
        self.total.add(stats)
        return stats

    def overall(self) -> EditStats:
        return self.total

    def summary(self) -> str:
        t = self.total
        return (f"Overall -> {t.wer:.2f} % N={t.all} C={t.cor} S={t.sub} "
                f"D={t.dele} I={t.ins}")


ALLOWED_SPECIAL_TOKENS = ("<sc>", "<bos_prompt>", "<eos_prompt>",
                          "<bos_speech>", "<eos_speech>", "<bos_response>",
                          "<eos_response>")


def clean_decoded_text(text: str) -> str:
    """Reference scoring normalization (inference_asr.py:158-165): keep the
    task specials (notably <sc>, which IS scored as a token), drop every
    other <...> special, space-join."""
    import re
    tokens = re.findall(r"<[^>]+>|[^<>\s]+", text)
    return " ".join(
        t for t in tokens
        if t in ALLOWED_SPECIAL_TOKENS
        or not (t.startswith("<") and t.endswith(">")))


def wer(lab_text: str, rec_text: str, char_mode: bool = False,
        case_sensitive: bool = False) -> float:
    calc = Calculator(char_mode, case_sensitive)
    return calc.calculate("utt", lab_text, rec_text).wer


def cpwer(ref_streams: Sequence[str], hyp_streams: Sequence[str],
          char_mode: bool = False,
          case_sensitive: bool = False) -> Tuple[float, Tuple[int, ...]]:
    """Concatenated minimum-permutation WER: score every assignment of
    hypothesis streams to reference streams, return (best WER%, best perm).
    Streams of unequal count are padded with empty strings."""
    K = max(len(ref_streams), len(hyp_streams))
    refs = list(ref_streams) + [""] * (K - len(ref_streams))
    hyps = list(hyp_streams) + [""] * (K - len(hyp_streams))

    def prep(t):
        return normalize_tokens(tokenize(t, char_mode), frozenset(),
                                case_sensitive)

    ref_toks = [prep(r) for r in refs]
    hyp_toks = [prep(h) for h in hyps]

    # native fast path (enumerates K! in C++)
    from mtasr_tpu.utils.native import cpwer_native
    vocab: dict = {}

    def ids(toks):
        return [vocab.setdefault(t, len(vocab)) for t in toks]

    native = cpwer_native([ids(r) for r in ref_toks],
                          [ids(h) for h in hyp_toks])
    if native is not None:
        return native

    best = None
    best_perm = None
    for perm in itertools.permutations(range(K)):
        err = 0
        tot = 0
        for i, j in enumerate(perm):
            s = align(ref_toks[i], hyp_toks[j])
            err += s.errors
            tot += s.all
        w = 100.0 * err / max(tot, 1)
        if best is None or w < best:
            best, best_perm = w, perm
    return best, best_perm


def score_files(ref_path: str, hyp_path: str, char_mode: bool = False,
                case_sensitive: bool = False, verbose: bool = False) -> str:
    """Kaldi-style 'utt_id text' files -> report text (stage 4/5/6 scoring,
    run.sh:316-325)."""
    from mtasr_tpu.data.audio import read_scp
    refs = read_scp(ref_path)
    hyps = read_scp(hyp_path)
    calc = Calculator(char_mode, case_sensitive)
    lines = []
    for utt_id, ref in refs.items():
        hyp = hyps.get(utt_id, "")
        stats = calc.calculate(utt_id, ref, hyp, need_alignment=verbose)
        if verbose:
            lines.append(f"utt: {utt_id}")
            lines.append("lab: " + " ".join(stats.lab_align))
            lines.append("rec: " + " ".join(stats.rec_align))
            lines.append(f"WER: {stats.wer:.2f} % N={stats.all} "
                         f"C={stats.cor} S={stats.sub} D={stats.dele} "
                         f"I={stats.ins}")
            lines.append("")
    lines.append(calc.summary())
    return "\n".join(lines)
