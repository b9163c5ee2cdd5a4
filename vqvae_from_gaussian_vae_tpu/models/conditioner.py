"""FLUX text conditioners — the HFEmbedder analog
(`/root/reference/pit/modules/flux/modules/conditioner.py:6`).

The reference wraps HF ``T5EncoderModel`` / ``CLIPTextModel`` downloads;
here the same contract is served by the transformers *Flax* classes
(`FlaxT5EncoderModel`, `FlaxCLIPTextModel`) loaded from a LOCAL path (this
image has no egress, so nothing downloads implicitly): CLIP versions emit
the ``pooler_output`` vector, T5 the ``last_hidden_state`` sequence —
exactly what `flux_pipeline.FluxPipeline.__call__` takes as ``inp_vec`` /
``inp_txt``.  For tests and custom stacks, a model (+ optional tokenizer)
can be injected directly, and ``embed_ids`` accepts pre-tokenized ids so
the tokenizer assets are optional.

The Redux image embedder (`pit/models/autoencoder.py:752,827` — a SigLIP
vision tower + projector behind ``FluxPriorReduxPipeline``) remains an
array input to the pipeline: its weights and the SigLIP tower are hub
assets with no local equivalent; supply its outputs via ``inp_txt`` /
``inp_vec``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


class HFEmbedder:
    """``HFEmbedder(version, max_length)`` -> ``embedder(texts) -> array``.

    version: a LOCAL directory containing a flax (or torch, converted by
    transformers) checkpoint of a CLIP text model (if the config's
    model_type is clip) or a T5 encoder.  Alternatively pass ``model`` (and
    optionally ``tokenizer``) directly.
    """

    def __init__(self, version: Optional[str] = None, max_length: int = 512,
                 is_clip: Optional[bool] = None, model=None, tokenizer=None,
                 **hf_kwargs):
        self.max_length = max_length
        if model is None:
            assert version is not None, "need a local model path or a model"
            from transformers import AutoConfig

            config = AutoConfig.from_pretrained(version)
            model_type = getattr(config, "model_type", "")
            if is_clip is None:
                is_clip = "clip" in model_type
            if is_clip:
                from transformers import CLIPTokenizer, FlaxCLIPTextModel

                model = FlaxCLIPTextModel.from_pretrained(version, **hf_kwargs)
                if tokenizer is None:
                    tokenizer = CLIPTokenizer.from_pretrained(version)
            else:
                from transformers import AutoTokenizer, FlaxT5EncoderModel

                model = FlaxT5EncoderModel.from_pretrained(version, **hf_kwargs)
                if tokenizer is None:
                    tokenizer = AutoTokenizer.from_pretrained(version)
        assert is_clip is not None, "pass is_clip when injecting a model"
        self.is_clip = bool(is_clip)
        self.output_key = "pooler_output" if self.is_clip else "last_hidden_state"
        self.model = model
        self.tokenizer = tokenizer

    def embed_ids(self, input_ids) -> jnp.ndarray:
        """(B, L) int32 token ids -> (B, D) pooled (CLIP) or (B, L, D) (T5).

        Mirrors the reference forward: no attention mask (fixed-length
        padded batches), frozen eval module."""
        outputs = self.model(input_ids=jnp.asarray(input_ids))
        return getattr(outputs, self.output_key)

    def __call__(self, texts: Sequence[str]) -> jnp.ndarray:
        assert self.tokenizer is not None, (
            "no tokenizer available - use embed_ids(input_ids) instead"
        )
        enc = self.tokenizer(
            list(texts), truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        return self.embed_ids(enc["input_ids"])
