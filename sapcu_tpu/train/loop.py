"""Training orchestration for fn and fd.

One driver replicating both reference loops (trainfn.py:229-434,
trainfd.py:247-452): iteration/epoch budgets, warmup + scheduler quirks
(in sapcu_tpu.train.optim), checkpoint cadence and filenames, validation
with best-model tracking / min_delta / early stopping, log.txt +
TensorBoard-compatible scalars, KeyboardInterrupt -> model_interrupt.pt
and crash -> model_crash.pt handling, and per-iteration throughput logs.

Multi-device: pass a mesh and batches are sharded over 'dp' with params
replicated; the same jitted step runs 1-chip or N-chip (GSPMD inserts the
grad all-reduce).
"""
from __future__ import annotations

import time

import jax
import numpy as np

from sapcu_tpu import data as data_mod
from sapcu_tpu import parallel
from sapcu_tpu.train import optim as optim_mod
from sapcu_tpu.train import steps as steps_mod
from sapcu_tpu.utils import CheckpointIO, effective_fd_training, get_model
from sapcu_tpu.utils.logging import RunLogger


def run_training(kind: str, cfg: dict, out_dir: str, *,
                 max_iterations: int | None = None,
                 batch_size: int | None = None,
                 mesh=None, resume: bool = True,
                 seed: int | None = None) -> dict:
    """Train an fn, fd, or sc model; returns summary dict."""
    assert kind in ("fn", "fd", "sc")
    # Deadline stops must flush the pending best snapshot. The chain
    # scripts' `kill -INT` cannot do it: background children of a
    # non-interactive shell inherit SIG_IGN for SIGINT and CPython then
    # never installs the KeyboardInterrupt handler (found round 5 — the
    # r5 fn trainer ignored the deadline INT). Route SIGTERM into the
    # KeyboardInterrupt path instead, which writes best + interrupt ckpts.
    import signal as _signal

    def _term(_sig, _frm):
        raise KeyboardInterrupt

    try:
        _signal.signal(_signal.SIGTERM, _term)
    except ValueError:      # not the main thread (tests drive this inline)
        pass
    t_cfg = cfg["training"]
    logger = RunLogger(out_dir, use_tensorboard=cfg.get(
        "monitoring", {}).get("use_tensorboard", True))

    batch_size = batch_size or int(t_cfg.get("batch_size", 4))
    max_it = max_iterations or int(t_cfg.get("max_iterations", 300000))
    max_epochs = int(t_cfg.get("max_epochs", 500))
    print_every = int(t_cfg.get("print_every", 100))
    checkpoint_every = int(t_cfg.get("checkpoint_every", 2000))
    validate_every = int(t_cfg.get("validate_every", 2000))
    backup_every = int(t_cfg.get("backup_every", 0) or 0)
    early_stopping = bool(t_cfg.get("early_stopping", False))
    patience = int(t_cfg.get("patience", 20000))
    min_delta = float(t_cfg.get("min_delta", 1e-4))
    # Tunnel-aware checkpoint throttles: on this runtime every checkpoint
    # pulls the full params (+optimizer) through the ~100s-KB/s stdio
    # relay, so TPU runs set save_optimizer=false (resume restarts the
    # optimizer) and space best-model saves at least
    # best_save_min_interval iterations apart (the improvement is still
    # TRACKED every validation; only the device->host pull is throttled,
    # and the final best is always written at run end).
    save_optimizer = bool(t_cfg.get("save_optimizer", True))
    best_save_min_interval = int(t_cfg.get("best_save_min_interval", 0))

    if cfg.get("data", {}).get("device_synthetic"):
        # Batches synthesized ON-DEVICE by a jitted generator — zero
        # host->device data traffic per step (the runtime's stdio tunnel
        # makes streamed batches cost seconds each). See data/device_synth.
        from sapcu_tpu.data.device_synth import DeviceSynthLoader
        d_cfg = cfg["data"]
        spe = int(d_cfg.get("steps_per_epoch", 250))
        if kind == "fn":
            pc_n = d_cfg.get("pointcloud_n", 512)  # int or list (cycled)
            gen_kwargs = dict(n_patches=int(d_cfg.get("patch_n", 64)),
                              k=int(d_cfg.get("patch_k", 12)),
                              n_cloud=(pc_n if isinstance(pc_n, (list, tuple))
                                       else int(pc_n)))
        elif kind == "fd":
            # patch_k defaults to the model graph k (reference parity:
            # fd/datacore.py:131-136 self-kNN patches with k=model.k);
            # set data.patch_k=100 to train at the SERVING patch size
            # (generation.py feeds k_neighbors=100 patches).
            gen_kwargs = dict(
                n_queries=int(d_cfg.get("num_queries",
                                        d_cfg.get("num_input_points", 256))),
                k=int(d_cfg.get("patch_k",
                                cfg.get("model", {}).get("k", 32))),
                n_cloud=int(d_cfg.get("num_input_points", 256)))
        else:  # sc
            pc_n = d_cfg.get("pointcloud_n", 1024)  # int or list (cycled)
            gen_kwargs = dict(n_cloud=(pc_n if isinstance(pc_n, (list, tuple))
                                       else int(pc_n)),
                              n_queries=int(d_cfg.get("num_queries", 512)),
                              n_dense=int(d_cfg.get("num_gt_points", 4096)))
            if "query_offset_max" in d_cfg:
                gen_kwargs["off_max"] = float(d_cfg["query_offset_max"])
        # str+lower: YAML `label_source: true` (unquoted) parses as a bool
        label_source = str(d_cfg.get("label_source", "pseudo")).lower()
        train_loader = DeviceSynthLoader(kind, batch_size, spe,
                                         seed=(seed or 0), train=True,
                                         label_source=label_source,
                                         **gen_kwargs)
        val_loader = DeviceSynthLoader(kind, batch_size,
                                       max(spe // 10, 4),
                                       seed=(seed or 0) + 7919, train=False,
                                       label_source=label_source,
                                       **gen_kwargs)
        train_ds = val_ds = ()
    elif kind == "sc":
        raise ValueError("the sc model trains on device-synthesized data; "
                         "set data.device_synthetic (or --device-synthetic)")
    else:
        train_ds = data_mod.get_dataset("train", cfg, kind)
        val_ds = data_mod.get_dataset("val", cfg, kind)
        train_loader = data_mod.DataLoader(train_ds, batch_size, shuffle=True,
                                           drop_last=True, seed=seed or 0)
        val_loader = data_mod.DataLoader(val_ds, batch_size, shuffle=False,
                                         drop_last=True, seed=0)
    steps_per_epoch = max(len(train_loader), 1)
    logger.message(f"{kind}: train={len(train_ds)} val={len(val_ds)} "
                   f"batch={batch_size} steps/epoch={steps_per_epoch}")

    params, model_state, model_cfg = get_model(cfg, kind, seed=seed)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    logger.message(f"Total number of parameters: {n_params:,}")

    if kind == "fn":
        tx = optim_mod.make_tx(
            params, optimizer=t_cfg.get("optimizer", "adamw"),
            betas=tuple(t_cfg.get("betas", (0.9, 0.999))),
            eps=float(t_cfg.get("eps", 1e-8)),
            weight_decay=float(t_cfg.get("weight_decay", 0.0)),
            grad_clip=t_cfg.get("grad_clip"),
            grad_clip_type=t_cfg.get("grad_clip_type", "norm"),
            snn_groups=True)
        sched = optim_mod.fn_schedule(cfg)
        train_step = steps_mod.make_fn_train_step(
            tx, model_cfg, use_amp=bool(t_cfg.get("use_amp", False)),
            accum_steps=int(t_cfg.get("gradient_accumulation", 1)))
        eval_step = steps_mod.make_fn_eval_step(model_cfg)
    elif kind == "sc":
        tx = optim_mod.make_tx(
            params, optimizer=t_cfg.get("optimizer", "adamw"),
            betas=tuple(t_cfg.get("betas", (0.9, 0.999))),
            eps=float(t_cfg.get("eps", 1e-8)),
            weight_decay=float(t_cfg.get("weight_decay", 1e-4)),
            grad_clip=t_cfg.get("grad_clip"),
            grad_clip_type=t_cfg.get("grad_clip_type", "norm"),
            snn_groups=False)
        sched = optim_mod.sc_schedule(cfg)
        disp_w = float(cfg.get("loss", {}).get("disp_weight", 100.0))
        train_step = steps_mod.make_sc_train_step(
            tx, model_cfg, use_amp=bool(t_cfg.get("use_amp", False)),
            disp_weight=disp_w)
        eval_step = steps_mod.make_sc_eval_step(model_cfg, disp_weight=disp_w)
    else:
        eff = effective_fd_training(cfg)
        tx = optim_mod.make_tx(
            params, optimizer=eff["optimizer"],
            betas=tuple(t_cfg.get("betas", (0.9, 0.999))),
            eps=float(t_cfg.get("eps", 1e-8)),
            weight_decay=eff["weight_decay"],
            grad_clip=eff["grad_clip"], snn_groups=False)
        sched = optim_mod.fd_schedule(eff, steps_per_epoch)
        train_step = steps_mod.make_fd_train_step(
            tx, model_cfg, beta=float(cfg.get("loss", {}).get("beta", 0.1)),
            use_amp=bool(t_cfg.get("use_amp", False)),
            accum_steps=int(t_cfg.get("gradient_accumulation", 1)))
        eval_step = steps_mod.make_fd_eval_step(
            model_cfg, beta=float(cfg.get("loss", {}).get("beta", 0.1)))
    opt_state = tx.init(params)

    ckpt = CheckpointIO(out_dir, model=params, optimizer=opt_state,
                        model_state=model_state)
    epoch_it, it = 0, 0
    metric_val_best = float("inf")
    best_it = 0  # patience anchor for early stopping
    last_best_save = -(10 ** 12)  # first improvement always writes
    best_snapshot = None          # device-side (params, state) pending write
    resume_file = (cfg.get("checkpoint", {}).get("resume_file", "model_best.pt")
                   if kind == "fn" else "model_best.pt")
    if resume and ckpt.exists(resume_file):
        try:
            scalars = ckpt.load(resume_file)
            params = ckpt.trees["model"]
            opt_state = ckpt.trees["optimizer"]
            model_state = ckpt.trees["model_state"]
            epoch_it = int(scalars.get("epoch_it", 0))
            it = int(scalars.get("it", 0))
            metric_val_best = float(scalars.get("loss_val_best", float("inf")))
            # Anchor the patience clock at the resumed iteration — the
            # reference counts no-improvement from process start
            # (trainfn.py:391-401); without this a resumed run with
            # it >= patience would early-stop at its first validation.
            best_it = it
            # When a warm start changes the validation objective (e.g.
            # fn continued with data.label_source="true": val now scores
            # against analytic normals, not the pseudo-label estimator),
            # the stored loss_val_best is on a different scale — keeping
            # it can starve best-checkpoint saves for the whole run and
            # trip early stopping at the first patience window.
            if cfg.get("checkpoint", {}).get("reset_best", False):
                metric_val_best = float("inf")
                logger.message("checkpoint.reset_best: stored "
                               "loss_val_best discarded (new val objective)")
            # Warm start under a NEW schedule: without this, a resumed
            # `it` (e.g. 40k from the prior run) lands past the new
            # cosine's t_max and the whole run trains at min_lr.
            if cfg.get("checkpoint", {}).get("reset_counters", False):
                epoch_it, it, best_it = 0, 0, 0
                logger.message("checkpoint.reset_counters: iteration/"
                               "epoch counters reset (weights kept)")
            logger.message(f"Resumed from {resume_file}: it={it} "
                           f"best={metric_val_best:.6f}")
        except Exception as e:  # reference logs and continues fresh
            logger.message(f"Error loading checkpoint: {e}")

    if mesh is not None:
        params = parallel.replicate_tree(mesh, params)
        opt_state = parallel.replicate_tree(mesh, opt_state)
        model_state = parallel.replicate_tree(mesh, model_state)

    def save(name: str, p=None, ms=None):
        if save_optimizer:
            ckpt.register(model=p if p is not None else params,
                          optimizer=opt_state,
                          model_state=ms if ms is not None else model_state)
        else:
            ckpt.trees.pop("optimizer", None)
            ckpt.register(model=p if p is not None else params,
                          model_state=ms if ms is not None else model_state)
        # model_cfg makes the checkpoint self-describing: serving MUST use
        # the architecture hyperparameters it was trained with (e.g. a
        # snn_mode=rate fn checkpoint served in feedback mode silently
        # degenerates — the param pytrees are identical).
        ckpt.save(name, epoch_it=epoch_it, it=it,
                  loss_val_best=metric_val_best,
                  model_cfg={k: v for k, v in model_cfg.items()})

    def run_validation() -> dict:
        nonlocal params, model_state
        sums, n = {}, 0
        carry = None
        for batch in val_loader:
            if mesh is not None:
                batch = parallel.shard_batch(mesh, batch)
            if kind == "fn":
                m = eval_step(params, model_state, batch["input"],
                              batch["normal"])
            elif kind == "sc":
                m = eval_step(params, model_state, batch["cloud"],
                              batch["query"], batch["normal"], batch["len"])
            else:
                m, carry = eval_step(params, model_state, batch["input"],
                                     batch["len"], carry)
            m = jax.device_get(m)  # one pull per val batch
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    # jax.profiler tracing (SURVEY.md §5.1: the reference has only a config
    # stub debug.profile; here it captures a real trace window)
    profile_cfg = bool(cfg.get("debug", {}).get("profile", False))
    profile_start = int(cfg.get("debug", {}).get("profile_start_it", 10))
    profile_steps = int(cfg.get("debug", {}).get("profile_steps", 5))
    profile_dir = f"{out_dir}/profile"

    rng_key = jax.random.PRNGKey(seed if seed is not None else 0)
    start = time.time()
    stop = False
    losses: list[float] = []
    summary: dict = {}

    # Deferred device scalars: the hot loop never blocks on a device->host
    # pull (the reference's float(loss) every step would serialize each
    # iteration on the transfer; on this runtime's stdio-relayed TPU tunnel
    # that dominates wall time). One device_get per print_every window.
    pending: list[tuple] = []  # (it, lr, (loss, gnorm, ok, rates|None))

    def flush_pending():
        nonlocal pending
        if not pending:
            return
        host = jax.device_get([p[2] for p in pending])
        for (it_i, lr_i, _), (loss_i, gnorm_i, ok_i, rates_i) in zip(
                pending, host):
            loss_f = float(loss_i)
            if not bool(ok_i):
                logger.message(f"WARNING: non-finite grads at it={it_i}, "
                               "step skipped")
            losses.append(loss_f)
            logger.add_scalar("train/loss", loss_f, it_i)
            logger.add_scalar("train/lr", lr_i, it_i)
            if rates_i is not None:
                logger.add_scalar("train/grad_norm", float(gnorm_i), it_i)
                for bi, r in enumerate(np.asarray(rates_i)):
                    logger.add_scalar(f"snn/spike_rate_block{bi}",
                                      float(r), it_i)
        pending = []

    try:
        while not stop:
            epoch_it += 1
            if it >= max_it or epoch_it >= max_epochs:
                break
            for batch in train_loader:
                it += 1
                lr, snn_lr = sched(it, epoch_it)
                if mesh is not None:
                    batch = parallel.shard_batch(mesh, batch)
                rng_key, step_rng = jax.random.split(rng_key)
                if kind == "fn":
                    (params, opt_state, model_state, loss, _conf, gnorm,
                     ok) = train_step(params, opt_state, model_state,
                                      batch["input"], batch["normal"],
                                      lr, snn_lr, step_rng)
                elif kind == "sc":
                    (params, opt_state, model_state, loss, gnorm,
                     ok) = train_step(params, opt_state, model_state,
                                      batch["cloud"], batch["query"],
                                      batch["normal"], batch["len"],
                                      lr, step_rng)
                else:
                    (params, opt_state, model_state, loss, gnorm,
                     ok) = train_step(params, opt_state, model_state,
                                      batch["input"], batch["len"],
                                      lr, step_rng)
                rates = (model_state.get("enc", {}).get("spike_rates")
                         if it % 100 == 0 else None)  # live snn/* telemetry
                # (the reference's hook at trainfn.py:245-249 is dead)
                pending.append((it, lr, (loss, gnorm, ok, rates)))

                if profile_cfg and it == profile_start:
                    jax.profiler.start_trace(profile_dir)
                    logger.message(f"profiler trace started -> {profile_dir}")
                if profile_cfg and it == profile_start + profile_steps:
                    jax.profiler.stop_trace()
                    logger.message("profiler trace stopped")

                if print_every > 0 and it % print_every == 0:
                    flush_pending()
                    avg = np.mean(losses[-print_every:])
                    sps = it * batch_size / max(time.time() - start, 1e-9)
                    logger.message(
                        f"[Epoch {epoch_it:03d}] it={it:06d}, "
                        f"loss={losses[-1]:.6f} (avg: {avg:.6f}), "
                        f"lr={lr:.2e}, samples/s={sps:.1f}")

                if checkpoint_every > 0 and it % checkpoint_every == 0:
                    if kind == "fn":
                        save(f"model_{it:06d}.pt")
                        save("model_latest.pt")
                    else:
                        save("model.pt")
                if backup_every > 0 and it % backup_every == 0:
                    save(f"backup_model_{it:06d}.pt")

                if validate_every > 0 and it % validate_every == 0:
                    flush_pending()
                    metrics = run_validation()
                    if not metrics:  # val set smaller than one batch
                        logger.message(
                            "Validation skipped: no full validation batch "
                            "(val set < batch_size with drop_last)")
                        metrics = None
                    if metrics:
                        metric_val = metrics["loss"]
                        logger.add_scalars("val", metrics, it)
                        logger.message(
                            f"Validation at it={it}: " + ", ".join(
                                f"{k}={v:.6f}" for k, v in metrics.items()))
                        # reference gates BOTH the best checkpoint and the
                        # patience reset on a min_delta improvement
                        # (trainfn.py:391-401)
                        if metric_val < metric_val_best - min_delta:
                            metric_val_best = metric_val
                            logger.message(
                                f"New best model! Loss: {metric_val_best:.6f}")
                            # device-side snapshot is free; only the WRITE
                            # (a device->host pull) is throttled
                            best_snapshot = (params, model_state)
                            if it - last_best_save >= best_save_min_interval:
                                save("model_best.pt")
                                last_best_save = it
                                best_snapshot = None
                            best_it = it
                        if early_stopping and it - best_it >= patience:
                            logger.message(
                                f"Early stopping at it={it} "
                                f"(patience {patience})")
                            stop = True
                            break

                if it >= max_it:
                    stop = True
                    break
        flush_pending()
        if best_snapshot is not None:  # throttled best, write it now
            save("model_best.pt", *best_snapshot)
            best_snapshot = None
        save("model_final.pt")
    except KeyboardInterrupt:
        flush_pending()
        logger.message("Training interrupted by user. Saving checkpoint...")
        if best_snapshot is not None:
            save("model_best.pt", *best_snapshot)
            best_snapshot = None
        save("model_interrupt.pt")
    except Exception as e:
        logger.message(f"Exception during training: {e}")
        try:
            save("model_crash.pt")
        except Exception:
            pass
        raise
    finally:
        try:
            flush_pending()
        except Exception:
            pass
        logger.close()

    if best_it:
        summary["best_it"] = best_it
    summary.update({"it": it, "epoch_it": epoch_it,
                    "loss_val_best": metric_val_best,
                    "final_loss": losses[-1] if losses else float("nan"),
                    "wall_time_s": time.time() - start})
    return summary
