"""The training driver: epochs, validation, checkpointing, LR scheduling.

Replaces the reference's pytorch-ignite engine stack (reference aimnet/train/
train.py + utils.py:219-330) with a plain loop over jitted steps:

- one compiled train step per size-group shape (static-shape buckets),
- validation each epoch with streaming metrics,
- ReduceLROnPlateau-style scheduling via host LR override,
- TerminateOnNaN + TerminateOnLowLR,
- checkpoint = msgpack-free npz of the param pytree (+ optimizer step count),
- JSONL metrics log (the reference's wandb integration is optional-gated).

Multi-device data parallelism: pass ``mesh``; each host batch is split into
per-device microbatches, stacked, and sharded over ``dp`` — XLA inserts the
gradient all-reduce (parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aimnetcentral_tpu.builders import stack_systems
from aimnetcentral_tpu.data.sgdataset import SizeGroupedDataset, SizeGroupedSampler
from aimnetcentral_tpu.models.aimnet2 import AIMNet2Config
from aimnetcentral_tpu.train.loss import LossConfig, MTLoss
from aimnetcentral_tpu.train.metrics import MetricConfig, RegMultiMetric
from aimnetcentral_tpu.train.step import (
    TrainState,
    get_learning_rate,
    init_train_state,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 100
    batch_size: int = 64
    batch_mode: str = "molecules"
    learning_rate: float = 1e-3
    grad_clip: float = 0.4
    weight_decay: float = 0.0
    lr_factor: float = 0.5  # plateau decay
    lr_patience: int = 5  # epochs without val improvement
    terminate_low_lr: float = 1e-6  # (reference aimnet/train/utils.py:258-265)
    checkpoint_dir: str | None = None
    log_file: str | None = None
    # experiment tracker: None | "jsonl" | "wandb"
    # (reference aimnet/train/utils.py:331-382 wandb integration)
    tracker: str | None = None
    tracker_project: str = "aimnet2-tpu"
    tracker_run_name: str | None = None
    seed: int = 0
    with_forces: bool = True
    # batch layout: "packed" = molecule-bin binned engine (dense per-molecule
    # block math, zero per-pair gathers — the fast path); "indexed" = flat
    # all-pairs neighbor matrices (the golden-parity twin)
    layout: str = "packed"
    # matmul tier for the train step: "fast" (1-pass bf16 dots, default) or
    # "exact" (ambient-HIGHEST f32 — TF32-off analogue; see make_train_step)
    precision: str = "fast"


def save_checkpoint(
    path: str, state: TrainState, scheduler: Mapping[str, float] | None = None
) -> None:
    """Params + FULL optimizer state + scheduler bookkeeping in one npz.

    The reference resumes weights only (its --load is a strict=False
    state_dict load, aimnet/train/train.py:120-126); carrying Adam moments
    and the plateau counters makes resume bit-continuous instead of
    restarting the optimizer cold."""
    p_leaves, _ = jax.tree.flatten(state.params)
    o_leaves, _ = jax.tree.flatten(state.opt_state)
    payload = {
        "__step__": int(state.step),
        **{f"p{i}": np.asarray(x) for i, x in enumerate(p_leaves)},
        **{f"o{i}": np.asarray(x) for i, x in enumerate(o_leaves)},
    }
    for k, v in (scheduler or {}).items():
        payload[f"__sched_{k}__"] = float(v)
    np.savez(path, **payload)


def load_checkpoint_params(path: str, params_template: Any) -> Any:
    with np.load(path) as z:
        leaves, treedef = jax.tree.flatten(params_template)
        new_leaves = [jnp.asarray(z[f"p{i}"]) for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


def load_checkpoint_full(
    path: str, state_template: TrainState
) -> tuple[TrainState, dict[str, float]]:
    """Restore (params, opt_state, step) + scheduler dict.  Checkpoints
    written before full-state saving (no ``o*`` keys) restore params only,
    keeping the template's fresh optimizer state."""
    with np.load(path) as z:
        params = load_checkpoint_params(path, state_template.params)
        opt_state = state_template.opt_state
        if "o0" in z:
            o_leaves, o_def = jax.tree.flatten(state_template.opt_state)
            new_o = []
            for i, tmpl in enumerate(o_leaves):
                x = z[f"o{i}"]
                new_o.append(
                    jnp.asarray(x, dtype=getattr(tmpl, "dtype", None))
                    if getattr(x, "shape", ()) != () or hasattr(tmpl, "dtype")
                    else x
                )
            opt_state = jax.tree.unflatten(o_def, new_o)
        step = jnp.asarray(int(z["__step__"])) if "__step__" in z else state_template.step
        sched = {
            k[len("__sched_"):-2]: float(z[k])
            for k in z.files
            if k.startswith("__sched_")
        }
    return TrainState(params=params, opt_state=opt_state, step=step), sched


class Trainer:
    def __init__(
        self,
        cfg: AIMNet2Config,
        params: Any,
        train_ds: SizeGroupedDataset,
        val_ds: SizeGroupedDataset | None = None,
        tcfg: TrainerConfig = TrainerConfig(),
        loss_cfg: LossConfig = LossConfig(),
        mesh=None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.mesh = mesh
        self.n_dev = mesh.devices.size if mesh is not None else 1

        self.optimizer = make_optimizer(
            learning_rate=tcfg.learning_rate,
            grad_clip=tcfg.grad_clip,
            weight_decay=tcfg.weight_decay,
        )
        if mesh is not None:
            from aimnetcentral_tpu.parallel import replicate

            params = replicate(mesh, params)
        self.state = init_train_state(params, self.optimizer)
        self.loss = MTLoss(loss_cfg)
        self._step_fn = jax.jit(
            make_train_step(
                cfg, self.loss, self.optimizer, tcfg.with_forces,
                precision=tcfg.precision,
            )
        )
        self._eval_fn = None
        self._lr = tcfg.learning_rate
        self._best_val = float("inf")
        self._plateau = 0

    def resume(self, path: str) -> None:
        """Full resume from a ``save_checkpoint`` file: params + Adam
        moments + step + plateau-scheduler bookkeeping (LR, patience
        counter, best score).  Weights-only checkpoints (pre-full-state, or
        exported from elsewhere) restore params and keep a fresh optimizer."""
        self.state, sched = load_checkpoint_full(path, self.state)
        if "lr" in sched:
            self._lr = sched["lr"]
            self.state = TrainState(
                params=self.state.params,
                opt_state=set_learning_rate(self.state.opt_state, self._lr),
                step=self.state.step,
            )
        self._plateau = int(sched.get("plateau", 0))
        self._best_val = sched.get("best_val", float("inf"))

    # -- batch conversion ---------------------------------------------------

    def _device_batch(self, size: int, sample: dict):
        """Split into per-device microbatches -> stacked (D, ...) arrays."""
        b = len(sample["numbers"])
        per_dev = int(np.ceil(b / self.n_dev))
        systems, labels = [], []
        for d in range(self.n_dev):
            part = {k: v[d * per_dev : (d + 1) * per_dev] for k, v in sample.items()}
            if len(part["numbers"]) == 0:
                part = {k: v[:0] for k, v in sample.items()}
            make = (
                self.train_ds.make_batch_system_packed
                if self.tcfg.layout == "packed"
                else self.train_ds.make_batch_system
            )
            sys_d, lab_d = make(size, part, pad_mols=per_dev)
            systems.append(sys_d)
            labels.append(lab_d)
        batch = stack_systems(systems)
        labs = {
            k: jnp.stack([jnp.asarray(l[k]) for l in labels])
            for k in labels[0]
        }
        if self.mesh is not None:
            from aimnetcentral_tpu.parallel import batch_sharding

            sh = batch_sharding(self.mesh)
            batch = jax.tree.map(lambda x: jax.device_put(x, sh), batch)
            labs = jax.tree.map(lambda x: jax.device_put(x, sh), labs)
        return batch, labs

    # -- loops --------------------------------------------------------------

    def train_epoch(self, epoch: int) -> dict[str, float]:
        sampler = SizeGroupedSampler(
            self.train_ds,
            self.tcfg.batch_size,
            batch_mode=self.tcfg.batch_mode,
            shuffle=True,
            seed=self.tcfg.seed + epoch,
        )
        losses = []
        for size, idx in sampler:
            sample = self.train_ds[size].sample(idx)
            batch, labels = self._device_batch(size, sample)
            self.state, metrics = self._step_fn(self.state, batch, labels)
            losses.append(float(metrics["loss"]))
            if not np.isfinite(losses[-1]):
                raise FloatingPointError(
                    f"NaN/inf loss at epoch {epoch} (TerminateOnNaN)"
                )
        return {"train_loss": float(np.mean(losses)) if losses else float("nan")}

    def validate(self) -> dict[str, float]:
        if self.val_ds is None:
            return {}
        if self._eval_fn is None:
            loss = self.loss
            from aimnetcentral_tpu.calculators.calculator import (
                ambient_matmul_context,
            )
            from aimnetcentral_tpu.models.aimnet2 import aimnet2_apply
            from aimnetcentral_tpu.train.step import ambient_for

            ambient = ambient_for(self.tcfg.precision)

            def eval_batch(params, batch, labels):
                def per_mb(system, lab):
                    def e_of(coord):
                        out = aimnet2_apply(
                            params, self.cfg, system.replace(coord=coord),
                            sae_external=False,
                        )
                        return out["energy"].sum(), out

                    (_, out), g = jax.value_and_grad(e_of, has_aux=True)(system.coord)
                    pred = {**out, "forces": -g}
                    total, _ = loss(pred, lab, system)
                    return total, pred

                # validation runs at the SAME precision tier as training —
                # checkpoint selection and plateau scheduling read these
                # metrics (a fast-tier eval next to an exact-tier train
                # step would pick checkpoints on noisier numbers)
                with ambient_matmul_context(ambient):
                    totals, preds = jax.vmap(per_mb)(batch, labels)
                return totals.mean(), preds

            self._eval_fn = jax.jit(eval_batch)

        sampler = SizeGroupedSampler(
            self.val_ds, self.tcfg.batch_size, batch_mode=self.tcfg.batch_mode
        )
        metric = RegMultiMetric(
            [
                MetricConfig(key_pred="energy", key_true="energy"),
                MetricConfig(key_pred="forces", key_true="forces", peratom=True),
                MetricConfig(key_pred="charges", key_true="charges", peratom=True),
            ]
        )
        losses = []
        for size, idx in sampler:
            sample = self.val_ds[size].sample(idx)
            batch, labels = self._device_batch(size, sample)
            total, preds = self._eval_fn(self.state.params, batch, labels)
            losses.append(float(total))
            numbers = np.asarray(batch.numbers)
            mask = {
                "energy": np.ones(np.asarray(labels["energy"]).shape, bool).ravel()
                if "energy" in labels
                else None,
                "forces": (numbers > 0).ravel(),
                "charges": (numbers > 0).ravel(),
            }
            metric.update(
                {k: np.asarray(v) for k, v in preds.items() if k in ("energy", "forces", "charges")},
                {k: np.asarray(v) for k, v in labels.items()},
                weights={k: v for k, v in mask.items() if v is not None},
            )
        out = metric.compute()
        out["val_loss"] = float(np.mean(losses)) if losses else float("nan")
        return out

    def fit(self) -> dict[str, Any]:
        tcfg = self.tcfg
        tracker = None
        if tcfg.tracker:
            from aimnetcentral_tpu.train.trackers import make_tracker

            tracker = make_tracker(
                tcfg.tracker,
                path=tcfg.log_file or "train_log.jsonl",
                project=tcfg.tracker_project,
                run_name=tcfg.tracker_run_name,
                config=dataclasses.asdict(tcfg),
            )
        history = []
        for epoch in range(tcfg.max_epochs):
            t0 = time.time()
            tr = self.train_epoch(epoch)
            val = self.validate()
            rec = {
                "epoch": epoch,
                "lr": self._lr,
                "wall_s": round(time.time() - t0, 2),
                **tr,
                **val,
            }
            history.append(rec)
            if tcfg.log_file and tcfg.tracker != "jsonl":
                # (the jsonl tracker already writes this record to log_file)
                with open(tcfg.log_file, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            if tracker is not None:
                tracker.log(rec, step=epoch)

            score = val.get("val_loss", tr["train_loss"])
            if score < self._best_val - 1e-12:
                self._best_val = score
                self._plateau = 0
                if tcfg.checkpoint_dir:
                    os.makedirs(tcfg.checkpoint_dir, exist_ok=True)
                    save_checkpoint(
                        os.path.join(tcfg.checkpoint_dir, "best.npz"),
                        self.state,
                        scheduler={
                            "lr": self._lr,
                            "plateau": self._plateau,
                            "best_val": self._best_val,
                        },
                    )
            else:
                self._plateau += 1
                if self._plateau >= tcfg.lr_patience:
                    self._lr *= tcfg.lr_factor
                    self.state = TrainState(
                        params=self.state.params,
                        opt_state=set_learning_rate(self.state.opt_state, self._lr),
                        step=self.state.step,
                    )
                    self._plateau = 0
            if self._lr < tcfg.terminate_low_lr:
                break
        return {"history": history, "best_val": self._best_val}
