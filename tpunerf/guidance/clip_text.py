"""Flax CLIP text encoder + tokenizer front-end.

TPU-native implementation of the text tower the reference loads through
transformers (src/stable_diffusion.py:80-82, hardwired to
`openai/clip-vit-large-patch14`): 12-layer causal transformer, hidden 768,
quick-gelu, final layer norm — output is the full (B, 77, 768) sequence used
as UNet cross-attention context.

Tokenization: if a CLIP vocab (vocab.json + merges.txt) is available on disk
a real BPE tokenizer is used (`BPETokenizer`); otherwise the deterministic
`HashTokenizer` keeps the pipeline runnable offline (ids are stable across
processes, so text-embedding caching and tests behave; swap in the real vocab
for weight-parity work).

Also supports textual-inversion concept tokens (reference `load_concept`,
stable_diffusion.py:130-159): extra embedding rows appended to the table.
"""
from __future__ import annotations

import dataclasses
import gzip
import json
import re
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    intermediate_size: int = 3072
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def vit_l_14(cls, dtype=jnp.float32) -> "CLIPTextConfig":
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4,
                   max_length=16, intermediate_size=64, dtype=dtype)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        D = cfg.hidden_size
        hd = D // cfg.num_heads
        q = nn.Dense(D, dtype=cfg.dtype, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(D, dtype=cfg.dtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=cfg.dtype, name="v_proj")(x)

        def split(t):
            B, N, _ = t.shape
            return t.reshape(B, N, cfg.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = jnp.where(mask, attn, -1e9)
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        B, H, N, hd2 = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, H * hd2)
        return nn.Dense(D, dtype=cfg.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        x = x + CLIPAttention(cfg, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm1")(x), mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 input_embeddings: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        """(B, L) token ids → (B, L, D) final hidden states (post final LN).

        `input_embeddings` bypasses the token table — the differentiable
        text-embedding path used for text-token optimization (reference
        `encode_text_embedding`, latent_paint_mesh/training/trainer.py:240-256).
        """
        cfg = self.config
        tok_emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                           name="token_embedding")
        if input_embeddings is None:
            x = tok_emb(input_ids)
        else:
            x = input_embeddings.astype(cfg.dtype)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_length, cfg.hidden_size))
        L = x.shape[1]
        x = x + pos[None, :L].astype(cfg.dtype)
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, name=f"layer_{i}")(x, causal)
        return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                            name="final_layer_norm")(x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Tokenizers
# ---------------------------------------------------------------------------

class HashTokenizer:
    """Deterministic offline stand-in for the CLIP BPE tokenizer.

    Same interface and special-token layout (BOS/EOS/pad-with-EOS,
    max_length truncation) so SDS plumbing, prompt-direction suffixing and
    caching all behave; ids are FNV-hashed words — NOT weight-compatible."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos_id = vocab_size - 2
        self.eos_id = vocab_size - 1
        self._extra: dict = {}

    def add_token(self, token: str) -> int:
        tid = self.vocab_size + len(self._extra)
        if token in self._extra:
            raise ValueError(f"tokenizer already contains token {token!r}")
        self._extra[token] = tid
        return tid

    def _word_id(self, word: str) -> int:
        if word in self._extra:
            return self._extra[word]
        h = 2166136261
        for ch in word.encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return h % (self.vocab_size - 2)

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        out = np.full((len(prompts), self.max_length), self.eos_id, np.int32)
        for i, p in enumerate(prompts):
            words = re.findall(r"[a-z0-9]+|[^\sa-z0-9]", p.lower())
            ids = [self.bos_id] + [self._word_id(w) for w in words]
            ids = ids[: self.max_length - 1] + [self.eos_id]
            out[i, : len(ids)] = ids
        return out


class BPETokenizer:
    """CLIP byte-pair-encoding tokenizer from on-disk vocab.json/merges.txt
    (the data files of openai/clip-vit-large-patch14)."""

    def __init__(self, vocab_path: Path, merges_path: Path,
                 max_length: int = 77):
        self.max_length = max_length
        with open(vocab_path) as f:
            self.encoder = json.load(f)
        merges = Path(merges_path).read_text().split("\n")
        merges = [tuple(m.split()) for m in merges
                  if m and not m.startswith("#")]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.bos_id = self.encoder["<|startoftext|>"]
        self.eos_id = self.encoder["<|endoftext|>"]
        self.cache = {}
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
            if False else
            r"'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+")

    def _bpe(self, token: str) -> List[str]:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        self.cache[token] = list(word)
        return list(word)

    def __call__(self, prompts: Sequence[str]) -> np.ndarray:
        if isinstance(prompts, str):
            prompts = [prompts]
        out = np.full((len(prompts), self.max_length), self.eos_id, np.int32)
        for i, p in enumerate(prompts):
            text = re.sub(r"\s+", " ", p.lower().strip())
            ids: List[int] = [self.bos_id]
            for tok in self.pat.findall(text):
                for piece in self._bpe(tok):
                    ids.append(self.encoder.get(
                        piece, self.encoder.get("</w>", self.eos_id)))
            ids = ids[: self.max_length - 1] + [self.eos_id]
            out[i, : len(ids)] = ids
        return out


def make_tokenizer(model_dir: Optional[Path] = None,
                   vocab_size: int = 49408,
                   max_length: int = 77):
    """Real BPE if vocab files exist under `model_dir/tokenizer`, else hash."""
    if model_dir is not None:
        tok_dir = Path(model_dir) / "tokenizer"
        v, m = tok_dir / "vocab.json", tok_dir / "merges.txt"
        if v.exists() and m.exists():
            return BPETokenizer(v, m, max_length)
    return HashTokenizer(vocab_size=vocab_size, max_length=max_length)
