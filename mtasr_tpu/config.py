"""Structured configuration for the TPU-native multi-talker ASR stack.

Flag names mirror the reference (`/root/reference/src/arguments.py:16-303` and
the config attributes wired in `finetune_asr.py:91-108`) so recipes transfer
1:1, but everything lives in plain dataclasses instead of HfArgumentParser.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple


# ---------------------------------------------------------------------------
# Encoder (WavLM) config — field names follow HF WavLMConfig so checkpoints
# and configs interop directly (reference vendors HF WavLM:
# models/modeling_wavlm.py:318-465).
# ---------------------------------------------------------------------------
@dataclass(eq=False)
class WavLMConfig:
    vocab_size: int = 32
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    feat_extract_activation: str = "gelu"
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    num_buckets: int = 320
    max_bucket_distance: int = 800
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    # adapter (conv downsampler on top of the transformer)
    add_adapter: bool = True
    adapter_kernel_size: int = 3
    adapter_stride: int = 2
    num_adapter_layers: int = 3
    output_hidden_size: Optional[int] = None  # defaults to hidden_size
    # SpecAugment (mask indices are computed host-side; see data/specaugment.py)
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10
    mask_feature_min_masks: int = 0
    # dropouts (elided under jit for inference; applied via rng in training)
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    layerdrop: float = 0.0  # reference sets layerdrop=0 at assembly time
    # keep the positional conv's torch weight_norm as separate (g, v)
    # parameters. Adam is not parametrization-invariant: the reference (HF
    # WavLM) trains g and v as distinct optimizer slots, so fine-tuning with
    # an unfrozen encoder only reproduces its dynamics under this flag.
    # Inference/serving fuses to a plain weight either way (wavlm_encoder
    # dispatches on the param keys).
    pos_conv_weight_norm: bool = False
    # attention implementation: 'auto' (flash on TPU, xla on CPU — the
    # production default), 'xla' (fused by the compiler, materializes the
    # gated rel-pos bias), or 'flash' (Pallas kernel, composes the bias in
    # VMEM — ~2x the XLA stack at B=128 where the [B,H,T,S] bias dominates
    # HBM traffic; on CPU it runs interpreted, so 'auto' avoids it there),
    # or 'flash_spmd' (the same kernels under custom_partitioning rules so
    # a dp x tp mesh splits fwd AND the 3-kernel backward per-device —
    # ops/pallas/spmd.py; selected by the Trainer/CLIs when a mesh is up)
    attention_impl: str = "auto"
    # rematerialize each encoder layer in backward (jax.checkpoint) — the
    # gradient_checkpointing equivalent, trades FLOPs for activation memory
    remat: bool = False
    # lax.scan over stacked layers 1..N-1 (layer 0 stays unrolled — it owns
    # the rel-pos bias table): one compiled layer body instead of N
    scan_layers: bool = False
    # conv frontend backend: "xla" (conv_general_dilated) or "matmul"
    # (tap-decomposed MXU matmuls — see layers.py::conv1d)
    conv_impl: str = "xla"
    # gelu erf path: "auto" (polynomial erf on TPU — the VPU has no erf
    # unit and the exact Eigen rational is 2.2x slower; exact on CPU for
    # torch-golden parity), "exact", or "fast". <=1 bf16 ulp difference.
    gelu_impl: str = "auto"
    # first conv layer (k=10, s=5, C_in=1) as a fused Pallas kernel with
    # LN+gelu epilogue: "auto" (on TPU when geometry/dtype match), "pallas"
    # (force; interpreted on CPU — tests), or "xla". The XLA conv runs this
    # layer at 0.8 TF/s (tiny contraction + lane-padded layouts): 53 ms of
    # the 146 ms frontend at B=128/10 s; the kernel measures ~29 ms.
    conv0_impl: str = "auto"

    @property
    def out_hidden(self) -> int:
        return self.output_hidden_size or self.hidden_size

    def conv_output_length(self, n_samples: int) -> int:
        """Frame count after the conv feature encoder (320x downsample)."""
        length = n_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            length = (length - k) // s + 1
        return length

    def adapter_output_length(self, n_frames: int, num_layers: Optional[int] = None) -> int:
        """Frame count after `num_layers` adapter conv layers (stride-2 each,
        kernel `adapter_kernel_size`, 'same'-style pad=1)."""
        if num_layers is None:
            num_layers = self.num_adapter_layers
        length = n_frames
        k, s = self.adapter_kernel_size, self.adapter_stride
        for _ in range(num_layers):
            length = (length + 2 * (k // 2) - k) // s + 1
        return length


def wavlm_base_config(**kw) -> WavLMConfig:
    return WavLMConfig(**kw)


def wavlm_large_config(**kw) -> WavLMConfig:
    defaults = dict(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, feat_extract_norm="layer", conv_bias=True,
        do_stable_layer_norm=True,
    )
    defaults.update(kw)
    return WavLMConfig(**defaults)


# ---------------------------------------------------------------------------
# Decoder (LLaMA) config — follows HF LlamaConfig naming
# (reference: models/llama_modules.py + models/modeling_llama.py).
# ---------------------------------------------------------------------------
@dataclass(eq=False)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: Optional[int] = None  # defaults to hidden_size // heads
    hidden_act: str = "silu"
    max_position_embeddings: int = 131072
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # llama3-style rope scaling: {"rope_type": "llama3", "factor": 32.0, ...}
    rope_scaling: Optional[dict] = None
    attention_bias: bool = False
    attention_dropout: float = 0.0
    mlp_bias: bool = False
    tie_word_embeddings: bool = False
    bos_token_id: int = 128000
    eos_token_id: int = 128001
    pad_token_id: Optional[int] = None
    # rematerialize decoder layers in backward (gradient checkpointing)
    remat: bool = False
    # lax.scan over stacked layer params on the no-cache (training) path:
    # one layer body compiled instead of num_hidden_layers copies — cuts
    # flagship train-step compile time drastically at the cost of one
    # parameter restack per step (negligible vs step time)
    scan_layers: bool = False
    # decode-step (L=1, KV-cached) attention implementation:
    #   "pallas" — fused Pallas kernel reading the merged-lane cache in its
    #              native layout (no transposed cache copies; ~5x decode-step
    #              attention win at B=128, see ops/pallas/decode_attention.py)
    #   "xla"    — plain einsum attention (always used on CPU, for int8 KV,
    #              and for unsupported head geometries)
    #   "pallas_spmd" — the same kernels wrapped in custom_partitioning
    #              rules (ops/pallas/spmd.py) so a dp x tp mesh splits
    #              them per-device instead of gathering the KV cache;
    #              selected automatically by the mesh-building CLIs
    decode_attn_impl: str = "pallas"

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads


def llama_1b_config(**kw) -> LlamaConfig:
    """LLaMA-3.2-1B geometry."""
    defaults = dict(
        hidden_size=2048, intermediate_size=8192, num_hidden_layers=16,
        num_attention_heads=32, num_key_value_heads=8, head_dim=64,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "high_freq_factor": 4.0, "low_freq_factor": 1.0,
                      "original_max_position_embeddings": 8192},
        tie_word_embeddings=True,
    )
    defaults.update(kw)
    return LlamaConfig(**defaults)


def llama_3b_config(**kw) -> LlamaConfig:
    """LLaMA-3.2-3B geometry."""
    defaults = dict(
        hidden_size=3072, intermediate_size=8192, num_hidden_layers=28,
        num_attention_heads=24, num_key_value_heads=8, head_dim=128,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "high_freq_factor": 4.0, "low_freq_factor": 1.0,
                      "original_max_position_embeddings": 8192},
        tie_word_embeddings=True,
    )
    defaults.update(kw)
    return LlamaConfig(**defaults)


def llama_8b_config(**kw) -> LlamaConfig:
    """LLaMA-3.1-8B geometry."""
    defaults = dict(
        hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "high_freq_factor": 4.0, "low_freq_factor": 1.0,
                      "original_max_position_embeddings": 8192},
    )
    defaults.update(kw)
    return LlamaConfig(**defaults)


# ---------------------------------------------------------------------------
# Composite model config — union of the reference's config surgery
# (finetune_asr.py:91-108, utils/create_from_pretrained.py:209-273) and the
# ModelArguments flags (src/arguments.py:16-203). Same names, same defaults.
# ---------------------------------------------------------------------------
@dataclass(eq=False)
class SpeechEncoderDecoderConfig:
    encoder: WavLMConfig = field(default_factory=WavLMConfig)
    decoder: LlamaConfig = field(default_factory=LlamaConfig)

    # --- special tokens (wired by create_from_pretrained.py:242-273) ---
    pad_token_id: int = 128256
    sc_token_id: int = 128257          # <sc> speaker change
    ignore_token_id: int = -100
    decoder_start_token_id: int = 128000  # BOS
    eos_token_id: int = 128001
    bos_token_id: int = 128000
    # instruct-mode special tokens
    instruct: bool = False
    bosp_token_id: int = 128258        # <bos_prompt>
    eosp_token_id: int = 128259        # <eos_prompt>
    boss_token_id: int = 128260        # <bos_speech>
    eoss_token_id: int = 128261        # <eos_speech>
    bosr_token_id: int = 128262        # <bos_response>
    eosr_token_id: int = 128263        # <eos_response>

    # --- serialized-CTC stack (ModelArguments names) ---
    talker_ctc: bool = False
    talker_ctc_refine: bool = False
    talker_numbers: int = 2
    separator_hidden: int = 896
    # per-time-step dropout inside the separator LSTM (reference
    # separator.py:86, dropout=0.2)
    separator_dropout: float = 0.2
    ctc_bridge: bool = False
    ctc_bridge_type: str = "raw"       # raw | softmax | ctcprompt
    train_mode: str = "attention"      # ctc | attention | hybrid
    ctc_alpha: float = 0.7

    # --- cross-attention adapter family ---
    decoder_cross_attention: bool = False
    decoder_cross_attention_type: str = "tiny"  # tiny|gatetiny|ctcaware|adapgatetiny
    decoder_cross_attention_feature: str = "raw"  # raw|mix|sep
    decoder_cross_attention_dynamic: bool = False
    decoder_cross_attention_dynamic_threshold: float = 0.0
    decoder_cross_attention_dynamic_loss: bool = False
    decoder_cross_attention_dynamic_ratio: float = 0.8
    cross_attn_dim: int = 512          # attn_dim of the tiny adapters
    r_max: int = 16
    lora_alpha: int = 16

    # --- decoder LoRA (PEFT-equivalent; insert_adapter_decoder.py:56-60) ---
    # rank/alpha are fixed at insertion time (init_decoder_lora); the dropout
    # rate applies to the LoRA-branch input during training only
    lora_dropout: float = 0.1

    # --- generation ---
    max_length: int = 200

    # --- static-shape bucketing (TPU addition; no reference equivalent) ---
    # max audio samples / speech frames per bucket are decided by the data
    # pipeline; the model itself is shape-polymorphic under jit.

    def validate(self) -> None:
        """Reject invalid switch combinations up front with a clear error.

        The reference wires these switches at module construction
        (modeling...llama.py:204-289), so a bad combination there surfaces
        as an unintelligible None-crash deep in forward; here we check at
        model init (init_model_params / load_model call this)."""
        err = []
        if self.train_mode not in ("ctc", "attention", "hybrid"):
            err.append(f"train_mode={self.train_mode!r} not in ctc/attention/hybrid")
        if self.ctc_bridge_type not in ("raw", "softmax", "ctcprompt"):
            err.append(f"ctc_bridge_type={self.ctc_bridge_type!r} invalid")
        if self.decoder_cross_attention_type not in (
                "tiny", "gatetiny", "ctcaware", "adapgatetiny"):
            err.append(f"decoder_cross_attention_type="
                       f"{self.decoder_cross_attention_type!r} invalid")
        if self.decoder_cross_attention_feature not in (
                "raw", "mix", "sep", "ctctoken"):
            err.append(f"decoder_cross_attention_feature="
                       f"{self.decoder_cross_attention_feature!r} invalid")
        needs_ctc = []
        if self.train_mode in ("ctc", "hybrid"):
            needs_ctc.append(f"train_mode={self.train_mode}")
        if self.ctc_bridge:
            needs_ctc.append("ctc_bridge")
        if self.talker_ctc_refine:
            needs_ctc.append("talker_ctc_refine")
        if (self.decoder_cross_attention
                and self.decoder_cross_attention_feature in ("sep", "ctctoken")):
            needs_ctc.append("decoder_cross_attention_feature="
                             + self.decoder_cross_attention_feature)
        if (self.decoder_cross_attention
                and self.decoder_cross_attention_type == "ctcaware"):
            needs_ctc.append("decoder_cross_attention_type=ctcaware")
        if needs_ctc and not self.talker_ctc:
            err.append(f"{', '.join(needs_ctc)} require(s) talker_ctc=True "
                       "(separator + serialized CTC heads)")
        if self.talker_ctc and self.talker_numbers < 2:
            err.append("talker_numbers must be >= 2 with talker_ctc "
                       "(reference separator.py:94)")
        if self.instruct:
            specials = (self.bosp_token_id, self.eosp_token_id,
                        self.boss_token_id, self.eoss_token_id,
                        self.bosr_token_id, self.eosr_token_id)
            if any(s is None or s < 0 for s in specials):
                err.append("instruct=True requires all six instruct special "
                           "token ids (create_from_pretrained wires them)")
            # None ids are already reported above; max() over mixed
            # int/None would raise TypeError before our ValueError
            elif max(specials) >= self.decoder.vocab_size:
                err.append(f"instruct special id {max(specials)} >= decoder "
                           f"vocab {self.decoder.vocab_size}; resize vocab")
        if err:
            raise ValueError("invalid SpeechEncoderDecoderConfig:\n  - "
                             + "\n  - ".join(err))

    @property
    def ctc_blank_id(self) -> int:
        # reference: odim = decoder.vocab_size + 1, blank = odim - 1
        # (modeling_speech_encoder_decoder_llama.py:187-193, ctc.py:44-46)
        return self.decoder.vocab_size

    @property
    def ctc_odim(self) -> int:
        return self.decoder.vocab_size + 1

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "SpeechEncoderDecoderConfig":
        d = json.loads(s)
        enc = WavLMConfig(**{k: tuple(v) if isinstance(v, list) else v
                             for k, v in d.pop("encoder").items()})
        dec = LlamaConfig(**d.pop("decoder"))
        return cls(encoder=enc, decoder=dec, **d)


# ---------------------------------------------------------------------------
# Training config (subset of HF Seq2SeqTrainingArguments the reference uses:
# run.sh:209-218, slurm/template.slurm:67-105)
# ---------------------------------------------------------------------------
@dataclass
class TrainingConfig:
    output_dir: str = "exp/run"
    learning_rate: float = 3e-5
    warmup_steps: int = 400
    max_steps: int = 100_000
    num_train_epochs: float = 30.0
    per_device_train_batch_size: int = 12
    per_device_eval_batch_size: int = 12
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    lr_scheduler_type: str = "linear"  # linear warmup-decay, HF default
    logging_steps: int = 25
    eval_steps: int = 1600
    save_steps: int = 1600
    save_total_limit: int = 5
    seed: int = 42
    bf16: bool = True
    gradient_checkpointing: bool = False
    # best-model retention (run.sh:202-204: metric_for_best_model=eval_loss,
    # greater_is_better=false, load_best_model_at_end)
    metric_for_best_model: str = "eval_loss"
    greater_is_better: bool = False
    load_best_model_at_end: bool = True
    # PCGrad on shared encoder+separator params (trainer_seq2seq.py:1071-1141)
    pcgrad: bool = True
    # mesh
    dp_size: int = -1   # -1: infer from devices
    tp_size: int = 1
    resume_from_checkpoint: Optional[str] = None


@dataclass(frozen=True)
class GenerationConfig:
    """Frozen + value-hashable: this object is a jit static argument, so
    identity hashing would silently recompile the decode program every time
    a caller constructs a fresh config."""
    max_length: int = 150          # max new tokens budget (inference_asr.py:187)
    max_new_tokens: Optional[int] = None
    num_beams: int = 1
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    use_cache: bool = True
    # int8 KV cache (per-token-per-head symmetric scales) — halves the
    # dominant HBM stream of the long-context decode step
    kv_quant: bool = False
    # Encode the batch in chunks of this many rows (None = whole batch at
    # once). Decode amortizes the per-step weight stream over the batch, so
    # big decode batches pay; the encoder's conv frontend however
    # materializes a [B, S/5, 512] intermediate (~8.4 GB bf16 at B=256,
    # 10 s) that caps the single-pass batch. Chunked encode bounds the
    # frontend's peak HBM while the decode still runs at full B.
    encode_chunk: Optional[int] = None
    # Speculative decoding (greedy only, output EXACTLY equals plain greedy
    # decode): "ctc" drafts the SOT continuation from the model's own
    # per-speaker CTC heads (zero extra draft-model cost — the architecture
    # computes them anyway); each verify step scores spec_k draft tokens in
    # ONE cached forward, amortizing the decode step's dominant weight +
    # KV-cache HBM streams over the accepted run length. Beyond-parity
    # feature (no reference counterpart).
    speculative: Optional[str] = None      # None | "ctc"
    spec_k: int = 4                        # draft tokens verified per step
    # KV-cache slots reserved for the generated region, as a multiple of
    # max_new_tokens (rejected drafts burn slots; they are masked invalid
    # and skipped, not compacted). When spec slots run low the engine
    # falls back to exact 1-token decode, so any factor >= 1 + (spec_k+1)/
    # max_new_tokens preserves output exactness; 2.0 keeps the fallback
    # rare at realistic acceptance rates.
    spec_cache_factor: float = 2.0


@dataclass
class DataConfig:
    dataset_name: Optional[str] = None
    audio_column_name: str = "audio"
    text_column_name: str = "text"
    max_duration_in_seconds: float = 20.0
    min_duration_in_seconds: float = 0.0
    do_lower_case: bool = True
    sampling_rate: int = 16000
    train_split_name: str = "train"
    eval_split_name: str = "test"
    # static-shape bucketing for TPU (audio-sample buckets)
    bucket_boundaries_seconds: Tuple[float, ...] = (5.0, 10.0, 15.0, 20.0)
    max_label_length: int = 256
