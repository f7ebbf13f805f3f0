"""Optimizer construction: AdamW / SGD / LARS with per-parameter group rules
and a host-driven stateless LR.

Parity: reference ``simseg/core/hooks/optimizer.py:90-118`` (optimizer by
name), ``simseg/tasks/clip/hooks/optimizer.py:14-36`` (regex
``optim.param_group_rules`` overriding lr/weight-decay per parameter name)
and ``simseg/core/optimizer/lars.py`` (LARS; here ``optax.lars``).

Design: the reference's stateless LR scheduler sets group LRs on the host
before every step (lr_scheduler.py:59-65). We keep that exact model —
schedules are plain Python functions of the global step; the scalar lr is
fed into the jitted train step and written into
``optax.inject_hyperparams`` state, so no retracing and no traced-python
schedule code.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import optax

from simseg_tpu.utils.logger import logger

# torch-style names accepted for reference-config compatibility
_NAME_ALIASES = {
    "torch.optim.AdamW": "adamw",
    "torch.optim.Adam": "adam",
    "torch.optim.SGD": "sgd",
    "LARS": "lars",
}


def _base_opt(name: str, opt_param: Dict[str, Any], weight_decay: float):
    name = _NAME_ALIASES.get(name, name).lower()
    betas = opt_param.get("betas", (0.9, 0.999))
    eps = opt_param.get("eps", 1e-8)
    momentum = opt_param.get("momentum", 0.9)
    if name == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay,
        )
    if name == "adam":
        # torch Adam applies weight_decay as COUPLED L2 (folded into the
        # gradient before the moments, not AdamW's decoupled decay) —
        # add_decayed_weights ahead of the transform reproduces that;
        # silently dropping the configured decay would train a different
        # objective than the reference
        def adam_l2(learning_rate, b1, b2, eps):
            tx = optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
            if weight_decay:
                tx = optax.chain(
                    optax.add_decayed_weights(weight_decay), tx)
            return tx

        return optax.inject_hyperparams(adam_l2)(
            learning_rate=0.0, b1=betas[0], b2=betas[1], eps=eps,
        )
    if name == "sgd":
        # torch SGD likewise folds weight_decay into the gradient before
        # momentum
        def sgd_l2(learning_rate, momentum):
            tx = optax.sgd(learning_rate, momentum=momentum)
            if weight_decay:
                tx = optax.chain(
                    optax.add_decayed_weights(weight_decay), tx)
            return tx

        return optax.inject_hyperparams(sgd_l2)(
            learning_rate=0.0, momentum=momentum,
        )
    if name == "lars":
        return optax.inject_hyperparams(optax.lars)(
            learning_rate=0.0,
            weight_decay=weight_decay,
            momentum=momentum,
            trust_coefficient=opt_param.get("trust_coefficient", 0.001),
        )
    raise NotImplementedError(f"optimizer '{name}'")


def _rule_pattern(rule: Dict[str, Any]) -> str:
    # accept both our 'pattern' key and the reference's 'regex'
    # (tasks/clip/hooks/optimizer.py:28)
    return rule.get("pattern") or rule["regex"]


def _param_labels(params, rules: Dict[str, Dict[str, Any]],
                  frozen_patterns=()):
    """Label each leaf: '_frozen' if it matches a frozen pattern, else the
    first matching regex rule, else 'default'. Parameter names are
    '/'-joined pytree paths (e.g. 'image_encoder/blocks_0/attn/qkv/kernel')."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path) -> str:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for pat in frozen_patterns:
            if re.search(pat, name):
                return "_frozen"
        for rule_name, rule in rules.items():
            if re.search(_rule_pattern(rule), name):
                return rule_name
        return "default"

    labels = {tuple(p): label_of(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(lambda p, _: labels[tuple(p)], params)


def build_optimizer(
    cfg, params, frozen_patterns=()
) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, set_lr) where ``set_lr(opt_state, lr)`` writes the
    host-computed lr (times any per-group multiplier) into the state.

    ``frozen_patterns``: regexes of parameter paths to exclude from updates
    (the reference's requires_grad=False gating: pipelines/clip.py:199-200,
    tasks/clip/hooks/optimizer.py:26-27).
    """
    opt_param = dict(cfg.optim.get("param", {}))
    weight_decay = opt_param.get("weight_decay", 0.0)
    base_lr = cfg.optim.get("lr", {}).get("init", None)
    rules = dict(cfg.optim.get("param_group_rules", {}) or {})

    mults: Dict[str, float] = {"default": 1.0}
    if rules or frozen_patterns:
        opts = {"default": _base_opt(cfg.optim.name, opt_param, weight_decay)}
        if frozen_patterns:
            opts["_frozen"] = optax.set_to_zero()
        for rule_name, rule in rules.items():
            # reference rule format: {'regex': ..., 'param': {'lr', 'weight_decay'}}
            rp = dict(rule.get("param", {}) or {})
            wd = rule.get("weight_decay", rp.get("weight_decay", weight_decay))
            opts[rule_name] = _base_opt(cfg.optim.name, opt_param, wd)
            if "lr_mult" in rule:
                mults[rule_name] = rule["lr_mult"]
            elif "lr" in rp and base_lr:
                mults[rule_name] = rp["lr"] / base_lr
            else:
                mults[rule_name] = 1.0
        labels = _param_labels(params, rules, frozen_patterns)
        tx = optax.multi_transform(opts, labels)
        logger.info(f"Optimizer param groups: {sorted(opts)}")
    else:
        tx = _base_opt(cfg.optim.name, opt_param, weight_decay)

    clip = cfg.optim.get("grad_clip", {}) or {}
    max_norm = clip.get("max_norm", None)
    if max_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_norm), tx)

    # NaN/inf guard: skip non-finite updates, abort after N consecutive bad
    # steps (bf16 training failure detection; SURVEY.md §5 notes the
    # reference has none)
    skip_nonfinite = cfg.optim.get("skip_nonfinite", 0) or 0
    if skip_nonfinite > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)

    # plain gradient accumulation (beyond reference): average grads over k
    # runner steps, apply on the k-th. NOTE this averages per-micro-batch
    # losses — for contrastive training the negatives stay micro-batch
    # local, which is a DIFFERENT objective than the reference's BSGS
    # (runner.name='clip_bsgs'), which reproduces exact full-batch InfoNCE
    # gradients. Use accumulation for memory relief on non-contrastive
    # objectives (MSE/linear-probe) or when micro-batch negatives suffice.
    accum = int(cfg.optim.get("grad_accum_steps", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)

    def set_lr(opt_state, lr):
        """Replace learning_rate in every InjectHyperparamsState
        (parity: BaseLRScheduler.set_lrs)."""
        return _map_inject_states(opt_state, lr, mults)

    return tx, set_lr


def _map_inject_states(node, lr, mults, label: Optional[str] = None):
    # inject_hyperparams state (class name varies across optax versions) —
    # any NamedTuple carrying a 'hyperparams' dict with learning_rate.
    if (
        isinstance(node, tuple)
        and hasattr(node, "_fields")
        and "hyperparams" in getattr(node, "_fields", ())
        and "learning_rate" in node.hyperparams
    ):
        hp = dict(node.hyperparams)
        hp["learning_rate"] = lr * mults.get(label or "default", 1.0)
        return node._replace(hyperparams=hp)
    if isinstance(node, dict):
        return {k: _map_inject_states(v, lr, mults, k if k in mults else label)
                for k, v in node.items()}
    if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
        return type(node)(*[
            _map_inject_states(getattr(node, f), lr, mults, label)
            for f in node._fields
        ])
    if isinstance(node, (list, tuple)):
        seq = [_map_inject_states(v, lr, mults, label) for v in node]
        return type(node)(seq) if isinstance(node, list) else tuple(seq)
    return node
