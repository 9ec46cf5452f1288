"""HFTokenizer wrapper coverage using a locally-built fast tokenizer (no
hub access): special-token wiring, encode/decode, prompt template flow."""
import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def hf_tok_dir(tmp_path_factory):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    words = ["hello", "world", "good", "day", "one", "two", "three"]
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for w in words:
        vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   bos_token="<s>", eos_token="</s>")
    d = tmp_path_factory.mktemp("hftok")
    fast.save_pretrained(str(d))
    return str(d)


def test_hf_tokenizer_specials_and_roundtrip(hf_tok_dir):
    from mtasr_tpu.data.tokenizer import HFTokenizer
    tok = HFTokenizer(hf_tok_dir)
    sp = tok.add_special_tokens(instruct=True)
    assert sp.pad_token_id is not None and sp.sc_token_id is not None
    assert sp.bosr_token_id is not None
    assert len({sp.pad_token_id, sp.sc_token_id, sp.bosp_token_id,
                sp.eosp_token_id, sp.boss_token_id, sp.eoss_token_id,
                sp.bosr_token_id, sp.eosr_token_id}) == 8

    ids = tok.encode("hello world <sc> good day", add_bos=False)
    assert sp.sc_token_id in ids
    text = tok.decode(ids, skip_special_tokens=False)
    assert "<sc>" in text
    from mtasr_tpu.utils.wer import clean_decoded_text
    assert clean_decoded_text(text) == "hello world <sc> good day"


def test_hf_tokenizer_prompt_template(hf_tok_dir):
    from mtasr_tpu.data.tokenizer import HFTokenizer, build_prompt_and_input
    tok = HFTokenizer(hf_tok_dir)
    sp = tok.add_special_tokens(instruct=True)
    p, i = build_prompt_and_input("good day", "hello world")
    ids = tok.encode(p + i, add_bos=False)
    # ordered specials present: bosp ... eosp boss eoss bosr ... eosr
    assert ids.index(sp.bosp_token_id) < ids.index(sp.eosp_token_id) \
        < ids.index(sp.boss_token_id) < ids.index(sp.eoss_token_id) \
        < ids.index(sp.bosr_token_id) < ids.index(sp.eosr_token_id)
