"""Training entry point — the `src/train.py` surface of the reference zoo
(MoCE-IR-main/src/train.py:92-148 call stack, SURVEY.md §3.1), TPU-native:
one process per host, pjit data parallelism over the mesh instead of
Lightning DDP, on-device noise synthesis, orbax checkpoints with auto-resume.

Usage:
  python -m image_restoration_tpu.cli.train --model restormer \
      --data_file_dir data/ --de_type derain --patch_size 128 --batch_size 8
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def build_model(cfg):
    from image_restoration_tpu.models import get_model

    kwargs = dict(cfg.get("model_kwargs", {}))
    # lists from YAML/CLI -> tuples for flax static fields
    kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()}
    if cfg.get("bf16", True):
        kwargs.setdefault("dtype", jnp.bfloat16)
    return get_model(cfg["model"], **kwargs)


def build_dataset(cfg):
    from image_restoration_tpu.data.datasets import AIOTrainDataset, CDD11, PairedFolderDataset

    kind = cfg.get("trainset", "aio")
    if kind == "aio":
        return AIOTrainDataset(cfg["data_file_dir"], cfg["de_type"],
                               cfg["patch_size"], seed=cfg.get("seed", 0),
                               name_list_dir=cfg.get("name_list_dir"))
    if kind == "cdd11":
        return CDD11(cfg["data_file_dir"], "train", cfg.get("cdd11_split", "all"),
                     cfg["patch_size"], seed=cfg.get("seed", 0))
    if kind == "paired":
        ds = PairedFolderDataset(cfg["lq_dir"], cfg["gt_dir"])
        return _PatchWrapper(ds, cfg["patch_size"], cfg.get("seed", 0))
    raise ValueError(kind)


class _PatchWrapper:
    """Random-crop+augment adapter over a full-image paired dataset."""

    def __init__(self, ds, patch, seed):
        from image_restoration_tpu.data.augment import paired_random_crop, random_augmentation

        self.ds, self.patch = ds, patch
        self.rng = np.random.default_rng(seed)
        self._crop, self._aug = paired_random_crop, random_augmentation

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        item = self.ds[i]
        lq, gt = self._crop(item["lq"], item["gt"], self.patch, self.rng)
        lq, gt = self._aug(lq, gt, rng=self.rng)
        item = dict(item, lq=lq, gt=gt)
        return item


def make_lr_schedule(cfg, steps_per_epoch: int):
    from image_restoration_tpu.train import schedulers as S

    total = cfg.get("max_steps") or cfg["epochs"] * steps_per_epoch
    name = cfg.get("scheduler", "linear_warmup_cosine")
    if name == "linear_warmup_cosine":
        return S.linear_warmup_cosine(cfg["lr"], cfg.get("warmup_epochs", 15) * steps_per_epoch,
                                      total, eta_min=1e-6), total
    if name == "cosine":
        return S.cosine_annealing(cfg["lr"], total, eta_min=1e-6), total
    if name == "cosine_restart_cyclic":
        sc = cfg.get("scheduler_kwargs", {})
        return S.cosine_annealing_restart_cyclic(cfg["lr"], **sc), total
    if name == "multistep":
        sc = cfg.get("scheduler_kwargs", {"milestones": [total // 2, total * 3 // 4]})
        return S.multistep(cfg["lr"], **sc), total
    return S.SCHEDULES[name](cfg["lr"]), total


# static model.apply kwargs implied by a recipe (heads that must exist at
# init time too, e.g. DarkIR's side projection)
RECIPE_APPLY_KWARGS = {"darkir": {"side_loss": True}}

# MoE families whose train-time apply must run with train=True so noisy
# top-k routing engages and the balance aux loss flows to the recipe
# (MoCE-IR-main/src/train.py:59-88 trains with the aux term; eval routing is
# deterministic). Derived from the models' class-level ``uses_moe_rng`` flag
# (ADVICE r4: a hardcoded name list silently trained future MoE models with
# train=False); the "moe" rng itself is always threaded by the trainer.
def model_apply_kwargs(model) -> dict:
    if getattr(type(model), "uses_moe_rng", False):
        return {"train": True}
    return {}


def build_recipe_kwargs(cfg):
    """Recipe closures that need host-loaded data (VGG weights)."""
    if cfg.get("recipe") != "transweather":
        return {}
    import jax
    import jax.numpy as jnp

    from image_restoration_tpu.eval.perceptual import (
        VGG16Features, vgg16_key_map,
    )

    vgg = VGG16Features(taps=(3, 8, 15))
    params = vgg.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 32, 32, 3), jnp.float32))["params"]
    if cfg.get("vgg_ckpt"):
        from image_restoration_tpu.utils.torch_import import (
            import_state_dict, load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(cfg["vgg_ckpt"])
        sd = {vgg16_key_map(k): v for k, v in sd.items()
              if vgg16_key_map(k) is not None}
        params = import_state_dict(params, sd, strict=False)
    else:
        print("WARNING: --recipe transweather without --vgg_ckpt: the "
              "perceptual term uses a random-init VGG (still a valid "
              "feature metric, but not the paper's)")
    return {"vgg_params": params}


def load_style_filter(cfg, params):
    """Graft a stage-1 StyleFilter checkpoint under params['style_filter']
    (the MWFormer two-stage driver, MWFormer/main_train_style.py:1-75 then
    frozen use in the restoration stage)."""
    if not cfg.get("style_ckpt"):
        return params
    if "style_filter" not in params:
        raise ValueError("--style_ckpt given but the model has no "
                         "'style_filter' subtree (use --model mwformer)")
    import jax.tree as jt
    import numpy as np

    template = params["style_filter"]
    # reuse the orbax/npz/torch loading logic with the subtree as template
    path = cfg["style_ckpt"]
    if path.endswith(".npz"):
        from image_restoration_tpu.train.checkpoint import load_params_npz

        loaded = load_params_npz(path, template)
    elif path.endswith((".pth", ".pt", ".ckpt", ".state")):
        from image_restoration_tpu.models.mwformer import style_filter_key_map
        from image_restoration_tpu.utils.torch_import import (
            import_state_dict, load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        sd = {style_filter_key_map(k): v for k, v in sd.items()
              if style_filter_key_map(k) is not None}
        loaded = import_state_dict(template, sd)
    else:
        from image_restoration_tpu.train.checkpoint import CheckpointManager

        restored, step = CheckpointManager(path).restore_raw()
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        loaded = restored["params"]
        print(f"style filter: loaded step {step} from {path}")
        assert jt.structure(jt.map(np.shape, loaded)) == jt.structure(
            jt.map(np.shape, template)), "style checkpoint/model mismatch"
    out = dict(params)
    out["style_filter"] = loaded
    return out


def build_validator(cfg, model, pad_multiple: int = 8):
    """In-training validation closure -> mean PSNR over a paired folder
    (NeRD-Rain train.py:176-189: forward, per-image PSNR, mean)."""
    from image_restoration_tpu.data.datasets import PairedFolderDataset
    from image_restoration_tpu.eval.metrics import psnr
    from image_restoration_tpu.eval.tiled import pad_test
    from image_restoration_tpu.train.trainer import make_eval_step

    if not (cfg.get("val_lq_dir") and cfg.get("val_gt_dir")):
        return None
    ds = PairedFolderDataset(cfg["val_lq_dir"], cfg["val_gt_dir"])
    n = len(ds)
    if cfg.get("val_max_images"):
        n = min(n, cfg["val_max_images"])
    eval_fn = make_eval_step(model, mesh=None, use_ema=bool(cfg.get("ema_decay")))

    def validate(state):
        vals = []
        for i in range(n):
            item = ds[i]
            lq = jnp.asarray(item["lq"])[None]
            gt = jnp.asarray(item["gt"])[None]
            out = pad_test(lambda z: eval_fn(state, z), lq, pad_multiple)
            vals.append(float(psnr(out.astype(jnp.float32), gt)[0]))
        return float(np.mean(vals))

    return validate


def main(argv=None, max_steps_override: int | None = None):
    from image_restoration_tpu.core.mesh import make_mesh
    from image_restoration_tpu.data.degradations import degrade_batch, mixup_device
    from image_restoration_tpu.data.pipeline import Loader, make_train_iterator
    from image_restoration_tpu.train.checkpoint import CheckpointManager
    from image_restoration_tpu.train.progressive import (
        ProgressiveSchedule, ReduceLROnPlateau,
    )
    from image_restoration_tpu.train.trainer import (
        TrainerConfig, TrainState, make_optimizer, make_train_step, replicate,
        set_lr_scale,
    )
    from image_restoration_tpu.utils.logging import MessageLogger, count_params
    from image_restoration_tpu.utils.options import dump_effective_config, parse_options

    from image_restoration_tpu.core.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()  # no-op unless IR_TPU_MULTIHOST/..._COORDINATOR set
    cfg = parse_options(argv)
    exp_dir = os.path.join(cfg["ckpt_dir"], cfg["name"])
    os.makedirs(exp_dir, exist_ok=True)
    dump_effective_config(cfg, os.path.join(exp_dir, "config.yaml"))

    if cfg.get("mesh"):
        mesh_shape = tuple(cfg["mesh"])
        axes = ("data", "expert", "spatial")[: len(mesh_shape)]
        mesh = make_mesh(mesh_shape, axes)
    else:
        # pure-DP default: data axis = largest divisor of batch_size that
        # also divides the device count (small smoke batches still shard)
        import math

        n = len(jax.devices())
        d = math.gcd(cfg["batch_size"], n)
        mesh = make_mesh((d,), ("data",), devices=jax.devices()[:d])

    model = build_model(cfg)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg["batch_size"], seed=cfg.get("seed", 0),
                    num_threads=cfg.get("num_workers", 8))
    steps_per_epoch = max(len(loader), 1)
    lr_sched, total_steps = make_lr_schedule(cfg, steps_per_epoch)
    if max_steps_override:
        total_steps = max_steps_override

    recipe = cfg.get("recipe", "default")
    apply_kwargs = {**model_apply_kwargs(model),
                    **RECIPE_APPLY_KWARGS.get(recipe, {})}
    tcfg = TrainerConfig(
        learning_rate=lr_sched, weight_decay=cfg.get("weight_decay", 0.0),
        grad_clip=cfg.get("grad_clip"), ema_decay=cfg.get("ema_decay"),
        loss=cfg["loss"], aux_loss_weight=cfg.get("aux_loss_weight", 0.0),
        recipe=recipe, recipe_kwargs=build_recipe_kwargs(cfg),
        apply_kwargs=apply_kwargs,
        plateau=bool(cfg.get("plateau")),
        accumulate_grad_batches=cfg.get("accumulate_grad_batches", 1),
        freeze_prefixes=tuple(cfg.get("freeze") or ()),
    )
    tx = make_optimizer(tcfg)

    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    sample = next(iter(loader.epoch(0)))
    init_x = jnp.asarray(sample["lq"][:1])
    init_rngs = {"params": rng, "moe": jax.random.PRNGKey(1)}
    params = model.init(init_rngs, init_x, **apply_kwargs)["params"]
    params = load_style_filter(cfg, params)
    print(f"model={cfg['model']} params={count_params(params)/1e6:.2f}M "
          f"total_steps={total_steps}")
    if tcfg.freeze_prefixes:
        print(f"frozen param subtrees: {list(tcfg.freeze_prefixes)}")
    state = TrainState.create(params, tx, ema_decay=tcfg.ema_decay)

    ckpt = CheckpointManager(os.path.join(exp_dir, "ckpt"),
                             save_every=cfg.get("save_every", 1000))
    start_step = 0
    if cfg.get("resume"):
        restored, step = ckpt.restore(state)
        if restored is not None:
            state, start_step = restored, step
            print(f"resumed from step {step}")

    logger = MessageLogger(exp_dir, total_steps, use_tb=cfg.get("tb"),
                           use_wandb=cfg.get("wandb"))
    step_fn = make_train_step(model, tx, tcfg, mesh=mesh)

    # progressive patch/batch schedule (HOGformer/Restormer recipe) — host
    # transform in the prefetch thread; at most num_buckets() compilations
    prog = None
    if cfg.get("prog_iters"):
        prog = ProgressiveSchedule(cfg["prog_iters"], cfg["prog_gt_sizes"],
                                   cfg["prog_batch_sizes"],
                                   scale=cfg.get("scale", 1))
        prog = prog.aligned(mesh.shape["data"])
        print(f"progressive schedule: {prog.num_buckets()} shape buckets")
    prog_rng = np.random.default_rng(cfg.get("seed", 0) + 7)
    transform = (lambda s, arrays: prog.apply_batch(arrays, s, prog_rng)) if prog else None

    plateau = None
    if cfg.get("plateau"):
        plateau = ReduceLROnPlateau(factor=cfg.get("plateau_factor", 0.5),
                                    patience=cfg.get("plateau_patience", 3),
                                    window=cfg.get("plateau_window", 1000))
    use_mixup = bool(cfg.get("mixup"))
    mixup = None
    if use_mixup:
        beta = cfg.get("mixup_beta", 1.2)
        ident = bool(cfg.get("mixup_identity"))
        mixup = jax.jit(lambda k, lq, gt: mixup_device(k, lq, gt, beta, ident))

    validate = build_validator(cfg, model, cfg.get("pad_multiple", 8))
    val_every = cfg.get("val_every", 0)
    best_psnr = -1.0

    with mesh:
        state = replicate(state, mesh)
        it = make_train_iterator(loader, mesh,
                                 start_epoch=start_step // steps_per_epoch,
                                 transform=transform, start_step=start_step)
        degrade = jax.jit(degrade_batch)
        for step in range(start_step, total_steps):
            batch = next(it)
            key = jax.random.fold_in(rng, step)
            batch = degrade(key, batch)
            lq, gt = batch["lq"], batch["gt"]
            if mixup is not None:
                lq, gt = mixup(jax.random.fold_in(key, 2), lq, gt)
            step_batch = {"lq": lq, "gt": gt}
            if recipe == "mwformer_style" and "de_id" in batch:
                step_batch["de_id"] = batch["de_id"]  # SupCon labels
            state, logs = step_fn(state, step_batch,
                                  jax.random.fold_in(key, 1))
            if step % cfg.get("log_every", 100) == 0 or step == total_steps - 1:
                logger.log(step, {k: v for k, v in logs.items()})
            if plateau is not None:
                new_scale = plateau.push_loss(float(logs["total"]))
                if new_scale is not None:
                    state = state.replace(
                        opt_state=set_lr_scale(state.opt_state, new_scale))
            if val_every and (step + 1) % val_every == 0 and validate is not None:
                val_psnr = validate(state)
                logger.log(step, {"psnr": val_psnr}, prefix="val")
                if ckpt.maybe_save_best(step + 1, jax.device_get(state), val_psnr):
                    best_psnr = val_psnr
                    print(f"step {step + 1}: new best val PSNR {val_psnr:.3f}")
            # fetch-to-host only on steps that actually save: device_get of
            # the full train state is ~100 MB through the axon tunnel
            # (measured ~8 s/step in the r4 learn runs when fetched eagerly)
            if ckpt.save_every and (step + 1) % ckpt.save_every == 0:
                ckpt.save(step + 1, jax.device_get(state))
        ckpt.save(total_steps, jax.device_get(state), force=True)
    if best_psnr >= 0:
        print(f"best val PSNR: {best_psnr:.3f}")
    print(f"done: {total_steps} steps; checkpoints in {exp_dir}/ckpt")
    return state


if __name__ == "__main__":
    main()
