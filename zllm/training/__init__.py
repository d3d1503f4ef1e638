"""Training / fine-tuning harness.

The counterpart of the reference's optimizer subsystem (reference:
ggml/src/ggml-opt.cpp — AdamW/SGD, cross-entropy loss, epoch loops; and
examples/training/finetune.cpp): optax optimizers over the dense params
pytree with a jitted value-and-grad step.  Quantized (QTensor) leaves are
frozen — fine-tune from a dense-loaded model, or attach LoRA adapters and
train just those.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import forward
from ..quant.repack import QTensor


def cross_entropy(params, cfg, tokens, targets, mask=None):
    """Mean next-token cross-entropy; targets/mask [B, T]."""
    logits, _ = forward(params, cfg, tokens, jnp.broadcast_to(
        jnp.arange(tokens.shape[1], dtype=jnp.int32), tokens.shape), None)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is not None:
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(nll)


def _trainable_mask(params):
    """QTensor planes and integer leaves are frozen."""
    def trainable(leaf):
        return hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)

    return jax.tree_util.tree_map(trainable, params)


@dataclass
class Trainer:
    """Jitted train step + epoch loop (ggml_opt_fit analogue)."""

    model: object
    optimizer: object = None  # optax optimizer
    lr: float = 1e-4

    def __post_init__(self):
        import optax

        if self.optimizer is None:
            self.optimizer = optax.adamw(self.lr)
        cfg = self.model.cfg
        opt = self.optimizer

        # differentiate only the float leaves: quantized integer planes are
        # frozen (grad through int dtypes is an error, and they are not
        # trainable anyway)
        flat, treedef = jax.tree_util.tree_flatten(self.model.params)
        self._train_idx = [
            i for i, leaf in enumerate(flat)
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
        ]
        train_idx = self._train_idx
        self._treedef = treedef
        self.opt_state = opt.init([flat[i] for i in train_idx])

        @jax.jit
        def step(params, opt_state, tokens, targets):
            leaves = jax.tree_util.tree_leaves(params)
            train = [leaves[i] for i in train_idx]

            def loss_fn(train_leaves):
                merged = list(leaves)
                for i, leaf in zip(train_idx, train_leaves):
                    merged[i] = leaf
                p = jax.tree_util.tree_unflatten(treedef, merged)
                return cross_entropy(p, cfg, tokens, targets)

            loss, grads = jax.value_and_grad(loss_fn)(train)
            updates, opt_state = opt.update(grads, opt_state, train)
            train = optax.apply_updates(train, updates)
            merged = list(leaves)
            for i, leaf in zip(train_idx, train):
                merged[i] = leaf
            return jax.tree_util.tree_unflatten(treedef, merged), opt_state, loss

        self._step = step

    def train_step(self, tokens: np.ndarray, targets: np.ndarray) -> float:
        params, self.opt_state, loss = self._step(
            self.model.params, self.opt_state, jnp.asarray(tokens), jnp.asarray(targets)
        )
        self.model.params = params
        return float(loss)

    def fit(self, token_stream: list[int], *, seq_len: int = 128, batch: int = 2, epochs: int = 1, log=None):
        """ggml_opt_fit-style epoch loop over a flat token stream."""
        ids = np.asarray(token_stream, dtype=np.int32)
        n_seq = (len(ids) - 1) // seq_len
        losses = []
        for _ in range(epochs):
            for start in range(0, n_seq, batch):
                nb = min(batch, n_seq - start)
                toks = np.zeros((batch, seq_len), np.int32)
                tgts = np.zeros((batch, seq_len), np.int32)
                for j in range(nb):
                    o = (start + j) * seq_len
                    toks[j] = ids[o : o + seq_len]
                    tgts[j] = ids[o + 1 : o + seq_len + 1]
                loss = self.train_step(toks, tgts)
                losses.append(loss)
                if log:
                    log(len(losses), loss)
        return losses


def train_step_fn(cfg, optimizer):
    """Standalone jitted train step builder (used by dryrun_multichip to
    exercise a sharded training step)."""
    import optax

    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(lambda p: cross_entropy(p, cfg, tokens, targets))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
