"""Prompt tables and text-feature classifiers.

Covers the reference's prompt machinery in TPU-native form:

- hand-crafted single-template tables ("a photo of a {cls}.") used by the
  TTL path (custom_clip.py:300,655-663);
- the 80-template ImageNet ensemble classifier (custom_clip_old.py:534-630,
  data/imagnet_prompts.py imagenet_templates);
- CoOp-style PromptLearner state for the TPT path: SOS prefix / class+EOT
  suffix embedding buffers around a tunable ctx block
  (custom_clip.py:221-466).

Design note (SURVEY.md section 5): the reference re-encodes all class prompts
under no_grad on EVERY forward (custom_clip.py:670-671). When the text tower
is frozen (lora_encoder='image', the default) that is pure recompute - here
the table is built once per dataset and reused, which is mathematically
identical.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..tokenizer.bpe import default_tokenizer, tokenize
from .clip import TextConfig, l2_normalize, text_features

_ASSETS = Path(__file__).resolve().parent.parent / "data" / "assets"


def load_imagenet_templates() -> List[str]:
    return json.loads((_ASSETS / "imagenet_templates.json").read_text())


def format_prompts(classnames: Sequence[str],
                   template: str = "a photo of a {}.") -> List[str]:
    """Underscores become spaces, exactly as PromptLearner does
    (custom_clip.py:296-300)."""
    return [template.format(c.replace("_", " ")) for c in classnames]


def prompt_tokens(classnames: Sequence[str],
                  prompt_prefix: str = "a photo of a") -> np.ndarray:
    """[C, 77] int32 token table for '<prefix> <classname>.'.

    The prefix is user input (--ctx_init) and is escaped so brace
    characters tokenize literally instead of being treated as a
    str.format template."""
    safe = prompt_prefix.replace("{", "{{").replace("}", "}}")
    return tokenize(format_prompts(classnames, safe + " {}."))


def needed_ctx_len(tokens, multiple: int = 16) -> int:
    """Static text-sequence length a token table actually needs.

    CLIP pads every prompt to 77 tokens, but the text tower is causal and
    pools at the EOT position (the largest token id), so positions after the
    longest EOT are dead compute: truncating to max(EOT)+1 (rounded up to a
    TPU-tile-friendly multiple - 16, the bf16 sublane tile, so the default
    compute dtype never pays a sequence-axis repack; f32's tile of 8 divides
    it) is EXACT - every pooled feature is
    unchanged. Real classname tables need ~16 of 77 positions, a ~4.8x cut
    in text-tower FLOPs/memory everywhere the table is (re-)encoded: the
    per-dataset classifier build, and every adaptation step of the
    TPT-prompt / CoCoOp / text-LoRA modes. The reference always pays the
    full 77 (clip/clip.py:196-232 pads; the towers never slice)."""
    eot = int(np.asarray(tokens).argmax(axis=-1).max())
    full = int(np.asarray(tokens).shape[-1])
    return min(-(-(eot + 1) // multiple) * multiple, full)


def build_text_classifier(params, tokens: jax.Array, cfg: TextConfig, *,
                          compute_dtype=jnp.bfloat16,
                          batch: int = 256,
                          truncate: bool = True) -> jax.Array:
    """Encode a token table into an L2-normalized [C, proj_dim] classifier.

    Encoding is chunked so a 1000-class table doesn't peak memory; the result
    matches ClipTestTimeTuning.get_text_features (custom_clip.py:651-663).
    `truncate` drops the dead padding positions (needed_ctx_len; exact).
    """
    if truncate:
        tokens = tokens[:, : needed_ctx_len(tokens)]
    feats = []
    n = tokens.shape[0]
    enc = jax.jit(lambda p, t: text_features(p, t, cfg,
                                             compute_dtype=compute_dtype))
    for i in range(0, n, batch):
        chunk = tokens[i: i + batch]
        pad = 0
        if chunk.shape[0] < batch and n > batch:
            pad = batch - chunk.shape[0]
            chunk = jnp.pad(chunk, ((0, pad), (0, 0)))
        f = enc(params, chunk)
        feats.append(f[: batch - pad] if pad else f)
    return l2_normalize(jnp.concatenate(feats, axis=0))


def build_ensemble_classifier(text_params, classnames: Sequence[str],
                              cfg: TextConfig, *,
                              templates: Sequence[str] | None = None,
                              compute_dtype=jnp.bfloat16,
                              truncate: bool = True) -> jax.Array:
    """80-template ensemble: per class, mean of per-template normalized
    embeddings, re-normalized (custom_clip_old.py zeroshot_classifier
    semantics). `text_params` is the text-tower pytree (params['text']).

    With `truncate`, all C x T prompts are tokenized up front and encoded at
    one global EOT-truncated length (needed_ctx_len; exact, and one static
    shape so the per-class encode compiles once)."""
    templates = list(templates or load_imagenet_templates())
    per_class = [
        tokenize([t.format(cls.replace("_", " ")) for t in templates])
        for cls in classnames]
    if truncate:
        ctx_len = needed_ctx_len(np.concatenate(per_class, axis=0))
        per_class = [t[:, :ctx_len] for t in per_class]
    out = []
    enc = jax.jit(lambda p, t: text_features(p, t, cfg,
                                             compute_dtype=compute_dtype))
    for toks in per_class:
        emb = l2_normalize(enc(text_params, jnp.asarray(toks)))
        mean = jnp.mean(emb, axis=0)
        out.append(mean / jnp.linalg.norm(mean))
    return jnp.stack(out)


# ------------------------------------------------------------- PromptLearner

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PromptLearnerState:
    """Functional CoOp prompt state for the TPT path (custom_clip.py:221-334).

    The tunable context block `ctx` [n_ctx, d] sits between the frozen SOS
    prefix embedding and the class-name+EOT suffix embeddings. `ctx_init`
    is kept for episodic reset (prompt_learner.reset(), custom_clip.py:336).
    """
    ctx: jax.Array           # [n_ctx, d] - the ONLY trainable tensor
    ctx_init: jax.Array      # snapshot for reset
    prefix: jax.Array        # [C, 1, d] SOS embedding
    suffix: jax.Array        # [C, L - 1 - n_ctx, d] class tokens + EOT + pad
    tokenized: jax.Array     # [C, L] for EOT-position pooling (L <= 77:
                             # padding past the longest EOT is truncated)
    name_lens: jax.Array     # [C] class-name token counts (middle/front)
    n_ctx: int = dataclasses.field(metadata={"static": True})
    prompt_prefix: str = dataclasses.field(metadata={"static": True})
    ctx_position: str = dataclasses.field(default="end",
                                          metadata={"static": True})
    # learned_cls=True (custom_clip.py:301-310, the reference's Bongard
    # configuration): a learnable 1-token class vector replaces the class
    # name; None in the standard path
    cls: Optional[jax.Array] = None          # [C, 1, d]
    cls_init: Optional[jax.Array] = None

    def assemble(self, ctx: jax.Array | None = None) -> jax.Array:
        """[C, L, d] prompt embeddings (L = tokenized.shape[1] <= 77,
        EOT-truncated) with the (possibly updated) ctx
        spliced at the configured class-token position
        (custom_clip.py:394-461: 'end' is the default/live path; 'middle'
        and 'front' re-order ctx around the class-name tokens)."""
        c = self.ctx if ctx is None else ctx
        n_cls = self.prefix.shape[0]
        ctx_block = jnp.broadcast_to(c, (n_cls, *c.shape))
        if self.cls is not None:
            # learned_cls: [SOS | ctx | cls | suffix] ('end' position only,
            # as the reference asserts - custom_clip.py:392-405)
            return jnp.concatenate(
                [self.prefix, ctx_block, self.cls, self.suffix], axis=1)
        if self.ctx_position == "end":
            return jnp.concatenate([self.prefix, ctx_block, self.suffix],
                                   axis=1)

        # middle/front: per class, interleave [class tokens | ctx] inside the
        # suffix. Static shapes: build a gather index per class from
        # name_lens (the suffix holds class tokens then EOT/pad).
        half = self.n_ctx // 2
        s_len = self.suffix.shape[1]
        out_pos = jnp.arange(self.n_ctx + s_len)  # positions after SOS

        def per_class(suffix_c, name_len):
            # source sequence: [ctx (n_ctx) | suffix (s_len)]
            src = jnp.concatenate([c.astype(suffix_c.dtype), suffix_c],
                                  axis=0)
            if self.ctx_position == "front":
                # class tokens first, then full ctx, then rest of suffix
                idx = jnp.where(
                    out_pos < name_len, self.n_ctx + out_pos,
                    jnp.where(out_pos < name_len + self.n_ctx,
                              out_pos - name_len,
                              out_pos))
            else:  # middle: ctx[:half], class, ctx[half:], rest
                idx = jnp.where(
                    out_pos < half, out_pos,
                    jnp.where(out_pos < half + name_len,
                              self.n_ctx + (out_pos - half),
                              jnp.where(out_pos < self.n_ctx + name_len,
                                        out_pos - name_len,
                                        out_pos)))
            return src[idx]

        body = jax.vmap(per_class)(self.suffix, self.name_lens)
        return jnp.concatenate([self.prefix, body], axis=1)

    def reset(self) -> "PromptLearnerState":
        return dataclasses.replace(self, ctx=self.ctx_init,
                                   cls=self.cls_init)


def init_prompt_learner(token_embed: jax.Array, classnames: Sequence[str],
                        ctx_init: str = "a_photo_of_a",
                        ctx_position: str = "end",
                        learned_cls: bool = False,
                        key: Optional[jax.Array] = None,
                        truncate: bool = True) -> PromptLearnerState:
    """Build the prompt-learner buffers from the (frozen) token embedding
    table. ctx vectors are the embeddings of the init phrase
    (custom_clip.py:243-269). With `learned_cls`, each class gets a random
    1-token learnable vector in place of its name ("X" placeholder prompts,
    custom_clip.py:301-310). `truncate` drops the dead padding positions
    past the longest EOT (needed_ctx_len; exact - the adaptation steps
    re-encode these prompts constantly)."""
    tk = default_tokenizer()
    phrase = ctx_init.replace("_", " ")
    n_ctx = len(phrase.split(" "))
    phrase_ids = tk.encode(phrase)
    assert len(phrase_ids) == n_ctx, "multi-token words unsupported in ctx_init"

    if learned_cls and ctx_position != "end":
        # the reference asserts the same restriction (custom_clip.py:392-393)
        raise ValueError("learned_cls requires ctx_position='end'")
    if learned_cls:
        prompts = [f"{phrase} X." for _ in classnames]
        toks = np.asarray(tokenize(prompts))
        ctx_len = needed_ctx_len(toks) if truncate else toks.shape[-1]
        toks = jnp.asarray(toks[:, :ctx_len])
        embedding = token_embed[toks]
        n_cls = len(classnames)
        d = token_embed.shape[-1]
        cls_vec = 0.02 * jax.random.normal(
            key if key is not None else jax.random.PRNGKey(0),
            (n_cls, 1, d), jnp.float32)
        suffix = embedding[:, 1 + n_ctx + 1:]  # skip the X slot
        name_lens = jnp.ones((n_cls,), jnp.int32)
    else:
        toks = prompt_tokens(classnames, phrase)
        ctx_len = needed_ctx_len(toks) if truncate else toks.shape[-1]
        toks = jnp.asarray(toks[:, :ctx_len])
        embedding = token_embed[toks]  # [C, ctx_len, d]
        cls_vec = None
        suffix = embedding[:, 1 + n_ctx:]
        name_lens = jnp.asarray([len(tk.encode(c.replace("_", " ")))
                                 for c in classnames], jnp.int32)

    ctx = token_embed[jnp.asarray(phrase_ids)]
    return PromptLearnerState(
        ctx=ctx.astype(jnp.float32),
        ctx_init=ctx.astype(jnp.float32),
        prefix=embedding[:, :1],
        suffix=suffix,
        tokenized=toks,
        name_lens=name_lens,
        n_ctx=n_ctx,
        prompt_prefix=phrase,
        ctx_position=ctx_position,
        cls=cls_vec,
        cls_init=cls_vec,
    )
