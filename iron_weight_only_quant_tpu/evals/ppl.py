"""Sequential perplexity evaluator (C18).

Mirrors reference main.py:42-140 ``SequentialPPLEvaluator`` semantics for
numerical parity:
  * tokenize the full test split, chop into ``seqlen`` chunks, drop remainder;
  * batches of 4 chunks;
  * HF shifted cross entropy: each chunk contributes ``seqlen - 1`` effective
    tokens; total NLL is token-weighted; PPL = exp(mean NLL).

The forward pass is jitted once per batch shape; logits are computed in
float32 regardless of weight dtype (SURVEY.md hard-part 3: bf16 weights with
fp32 loss keeps PPL within tolerance).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_loaders

DATASET_MAP = {"wikitext": "wikitext2", "ptb": "ptb", "c4": "c4"}


@partial(jax.jit, static_argnames=("forward", "cfg"))
def _chunk_nll(params, batch: jnp.ndarray, forward, cfg) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum of shifted-token NLL and token count for a [B, S] batch."""
    logits, _ = forward(params, batch, cfg)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = batch[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = logz - tgt
    return jnp.sum(nll), jnp.asarray(nll.size, jnp.int32)


class SequentialPPLEvaluator:
    def __init__(
        self,
        params,
        forward: Callable,
        cfg,
        model_path: str = "",
        seqlen: int = 2048,
        batch_size: int = 4,
        vocab_size: Optional[int] = None,
    ):
        self.params = params
        self.forward = forward
        self.cfg = cfg
        self.model_path = model_path
        self.seqlen = seqlen
        self.batch_size = batch_size
        self.vocab_size = vocab_size or getattr(cfg, "vocab_size", 256)
        self._token_cache: Dict[str, np.ndarray] = {}

    def _load_tokens(self, dataset: str) -> np.ndarray:
        key = DATASET_MAP.get(dataset.lower(), dataset)
        if key not in self._token_cache:
            _, test = get_loaders(
                key, nsamples=1, seed=0, seqlen=self.seqlen,
                model=self.model_path, vocab_size=self.vocab_size,
            )
            self._token_cache[key] = np.asarray(test.input_ids, dtype=np.int64)
        return self._token_cache[key]

    def calculate_ppl(
        self, dataset: str, max_chunks: Optional[int] = None
    ) -> Tuple[float, int, int]:
        """Returns (ppl, total_tokens, n_chunks) -- same contract as the
        reference's calculate_ppl (main.py:81-140)."""
        tokens = self._load_tokens(dataset)
        total_len = tokens.shape[1]
        nsamples = total_len // self.seqlen
        if nsamples == 0:
            raise ValueError(f"dataset {dataset} shorter than seqlen {self.seqlen}")
        if max_chunks is not None and max_chunks > 0:
            nsamples = min(nsamples, max_chunks)

        total_nll = 0.0
        total_tokens = 0
        bsz = self.batch_size
        for start in range(0, nsamples, bsz):
            end = min(start + bsz, nsamples)
            chunks = [
                tokens[:, i * self.seqlen : (i + 1) * self.seqlen]
                for i in range(start, end)
            ]
            batch = jnp.asarray(np.concatenate(chunks, axis=0), jnp.int32)
            nll, count = _chunk_nll(self.params, batch, self.forward, self.cfg)
            total_nll += float(nll)
            total_tokens += int(count)
        if total_tokens == 0:
            return float("inf"), 0, nsamples
        return math.exp(total_nll / total_tokens), total_tokens, nsamples
