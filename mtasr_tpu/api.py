"""High-level one-call inference API.

The reference exposes inference only through scripts
(/root/reference/inference_asr.py:49-221 — load, preprocess, per-sample
generate loop, detokenize); embedding it in another program means
re-assembling that script by hand. `Transcriber` packages the same flow
as a library object:

    from mtasr_tpu.api import Transcriber
    t = Transcriber.from_pretrained("exp/model", kv_quant=True)
    texts = t.transcribe(["a.wav", "b.wav"])           # SOT decode
    per_spk = t.transcribe_ctc(["a.wav"])              # K CTC streams

Everything rides the production paths: the bucketed static-shape batcher
(data/pipeline.py), the jitted prefill+decode engine (generate/engine.py),
optional int8 serving (utils/quantize.py) and dp x tp mesh sharding
(parallel/mesh.py). Results come back in input order regardless of
length-bucket batching.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from mtasr_tpu.config import (
    DataConfig, GenerationConfig, SpeechEncoderDecoderConfig,
)
from mtasr_tpu.data.audio import Utterance, normalize_waveform
from mtasr_tpu.data.pipeline import (
    PreparedExample, batches_from_examples, prepare_example,
)
from mtasr_tpu.data.tokenizer import CharTokenizer, HFTokenizer
from mtasr_tpu.utils.wer import clean_decoded_text

AudioInput = Union[str, np.ndarray]


def resolve_tokenizer(model_dir: Optional[str],
                      tokenizer_name: Optional[str],
                      cfg: SpeechEncoderDecoderConfig):
    """The CLI's tokenizer resolution order (cli/inference_asr.py): explicit
    HF name > char_tokenizer.json saved next to the model > fresh
    CharTokenizer with special tokens wired into cfg."""
    if tokenizer_name:
        return HFTokenizer(tokenizer_name)
    saved = (os.path.join(model_dir, "char_tokenizer.json")
             if model_dir else None)
    if saved and os.path.exists(saved):
        return CharTokenizer.load(saved)
    tokenizer = CharTokenizer()
    sp = tokenizer.add_special_tokens(instruct=cfg.instruct)
    cfg.pad_token_id, cfg.sc_token_id = sp.pad_token_id, sp.sc_token_id
    return tokenizer


class Transcriber:
    """Batched multi-talker transcription over a loaded composite model."""

    def __init__(self, cfg: SpeechEncoderDecoderConfig, params: dict,
                 tokenizer, *, mesh=None,
                 gen: Optional[GenerationConfig] = None,
                 dc: Optional[DataConfig] = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.gen = gen or GenerationConfig(do_sample=False)
        # permissive bounds: an API call must never silently drop an input
        # the way the training duration filter does
        self.dc = dc or DataConfig(min_duration_in_seconds=0.0,
                                   max_duration_in_seconds=1e9)

    # -- construction --------------------------------------------------------
    @classmethod
    def from_pretrained(cls, model_dir: str, *,
                        tokenizer_name: Optional[str] = None,
                        quantize: str = "none", kv_quant: bool = False,
                        dp_size: int = -1, tp_size: int = 1,
                        instruct: Optional[bool] = None,
                        gen: Optional[GenerationConfig] = None
                        ) -> "Transcriber":
        """Load a saved model directory (utils/model_io.py layout) and
        prepare it for serving. quantize: none|w8|w8a8 (decoder);
        kv_quant: int8 KV cache; dp/tp: device mesh axes (-1 dp = all
        remaining devices)."""
        from mtasr_tpu.utils.model_io import load_model, load_model_quantized
        if quantize != "none":
            # streaming per-tensor load keeps peak HBM at the int8 serving
            # footprint (8B fits one 16 GB chip); LoRA dirs fall back to
            # load + merge + on-device quantize
            try:
                cfg, params = load_model_quantized(model_dir, mode=quantize,
                                                   scope="decoder")
            except ValueError:
                from mtasr_tpu.train.lora import merge_decoder_lora
                from mtasr_tpu.utils.quantize import quantize_for_serving
                cfg, params = load_model(model_dir)
                params = merge_decoder_lora(params)
                params = quantize_for_serving(params, mode=quantize,
                                              scope="decoder")
        else:
            cfg, params = load_model(model_dir)
        if instruct is not None:
            cfg.instruct = instruct
        mesh = None
        import jax
        tp = max(1, tp_size)
        dp = dp_size if dp_size > 0 else max(1, jax.device_count() // tp)
        if dp * tp > 1:
            from mtasr_tpu.parallel.mesh import make_mesh, shard_params
            mesh = make_mesh(dp_size=dp, tp_size=tp)
            params = shard_params(params, mesh)
        g = gen or GenerationConfig(do_sample=False, kv_quant=kv_quant)
        tok = resolve_tokenizer(model_dir, tokenizer_name, cfg)
        return cls(cfg, params, tok, mesh=mesh, gen=g)

    # -- input prep ----------------------------------------------------------
    def _examples(self, audio: Sequence[AudioInput],
                  prompt: str) -> List[PreparedExample]:
        out = []
        for i, a in enumerate(audio):
            uid = f"@{i}"
            if isinstance(a, str):
                ex = prepare_example(
                    Utterance(uid, a, "", prompt), self.tokenizer, self.dc,
                    instruct=self.cfg.instruct, lazy=True)
                if ex is None:  # out of the permissive bounds: empty file
                    ex = PreparedExample(uid, np.zeros(1, np.float32), [],
                                         self._prompt_ids(prompt), 1)
            else:
                wav = normalize_waveform(np.asarray(a, np.float32))
                ex = PreparedExample(uid, wav, [],
                                     self._prompt_ids(prompt), len(wav))
            out.append(ex)
        return out

    def _prompt_ids(self, prompt: str) -> List[int]:
        if not self.cfg.instruct:
            return []
        from mtasr_tpu.data.tokenizer import build_prompt_and_input
        prompt_str, _ = build_prompt_and_input(prompt, "")
        return self.tokenizer.encode(prompt_str, add_bos=False)

    def _batches(self, examples: List[PreparedExample], batch_size: int):
        # inputs longer than the last duration bucket must not be silently
        # clipped (bucket_length snaps to the final boundary): extend the
        # bucket ladder for this call so every input fits
        dc = self.dc
        max_secs = max(e.n_samples for e in examples) / dc.sampling_rate
        if max_secs > dc.bucket_boundaries_seconds[-1]:
            import dataclasses
            bounds = tuple(dc.bucket_boundaries_seconds) + (max_secs,)
            dc = dataclasses.replace(dc, bucket_boundaries_seconds=bounds)
        return batches_from_examples(
            examples, self.cfg, dc, batch_size, training=False,
            shuffle=False, drop_last=False)

    # -- decoding ------------------------------------------------------------
    def transcribe(self, audio: Sequence[AudioInput], *, prompt: str = "",
                   batch_size: int = 8,
                   max_new_tokens: Optional[int] = None,
                   num_beams: int = 1,
                   clean: bool = True) -> List[str]:
        """Greedy (or self.gen-configured) SOT decode. audio: wav paths or
        1-D float waveforms at DataConfig.sampling_rate. Returns one
        serialized transcript per input, `<sc>`-separated speakers.
        num_beams > 1 routes through the HF-semantics-exact beam engine
        (generate/beam.py) and returns each input's best beam."""
        import jax.numpy as jnp
        from mtasr_tpu.generate import generate
        results: Dict[str, str] = {}
        examples = self._examples(audio, prompt)
        for batch in self._batches(examples, batch_size):
            wav = jnp.asarray(batch.arrays["input_values"])
            amask = jnp.asarray(batch.arrays["audio_mask"])
            if self.mesh is not None:
                from mtasr_tpu.parallel.mesh import shard_batch
                sb = shard_batch({"w": wav, "m": amask}, self.mesh)
                wav, amask = sb["w"], sb["m"]
            pr = (jnp.asarray(batch.arrays["prompt_ids"])
                  if "prompt_ids" in batch.arrays else None)
            if num_beams > 1:
                from mtasr_tpu.generate.beam import beam_generate
                bout = beam_generate(
                    self.params, self.cfg, wav, amask, prompt_ids=pr,
                    num_beams=num_beams,
                    max_new_tokens=max_new_tokens or
                    (self.gen.max_new_tokens or self.gen.max_length),
                    kv_quant=self.gen.kv_quant)
                seqs = np.asarray(bout.sequences)[:, 0]   # best beam
            else:
                out = generate(self.params, self.cfg, wav, amask,
                               prompt_ids=pr, gen=self.gen,
                               max_new_tokens=max_new_tokens)
                seqs = np.asarray(out.sequences)
            for i, uid in enumerate(batch.utt_ids):
                text = self.tokenizer.decode(seqs[i],
                                             skip_special_tokens=False)
                results[uid] = clean_decoded_text(text) if clean else text
        return [results[f"@{i}"] for i in range(len(audio))]

    def transcribe_ctc(self, audio: Sequence[AudioInput], *,
                       batch_size: int = 8, max_out_len: int = 150,
                       clean: bool = True) -> List[List[str]]:
        """One-shot CTC decode: K per-speaker transcripts per input
        (the reference's generate_ctc / forward_ctc path)."""
        if not self.cfg.talker_ctc:
            raise ValueError("transcribe_ctc needs talker_ctc CTC heads")
        import jax.numpy as jnp
        from mtasr_tpu.generate import generate_ctc
        results: Dict[str, List[str]] = {}
        examples = self._examples(audio, prompt="")
        K = self.cfg.talker_numbers
        for batch in self._batches(examples, batch_size):
            wav = jnp.asarray(batch.arrays["input_values"])
            amask = jnp.asarray(batch.arrays["audio_mask"])
            if self.mesh is not None:
                from mtasr_tpu.parallel.mesh import shard_batch
                sb = shard_batch({"w": wav, "m": amask}, self.mesh)
                wav, amask = sb["w"], sb["m"]
            trans, lens = generate_ctc(self.params, self.cfg, wav, amask,
                                       max_out_len=max_out_len)
            # trans: [B, K*max_out_len] head-major blocks; lens: [K, B]
            trans = np.asarray(trans).reshape(len(batch.utt_ids), K, -1)
            lens = np.asarray(lens).T
            for i, uid in enumerate(batch.utt_ids):
                streams = []
                for k in range(K):
                    ids = trans[i, k, :lens[i, k]]
                    text = self.tokenizer.decode(ids,
                                                 skip_special_tokens=False)
                    streams.append(clean_decoded_text(text) if clean
                                   else text)
                results[uid] = streams
        return [results[f"@{i}"] for i in range(len(audio))]
