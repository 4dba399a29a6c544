"""Training CLI entry point.

Reference analog: train.py + onmt/train_single.py (SURVEY.md §2.1 L6,
§3.1).  The reference spawns one OS process per GPU; here a single
process drives all local chips through shardings (multi-host runs start
one process per host, as JAX expects).

    python -m nanodecoder_tpu.cli.train --ckpt-dir ckpts --steps 5000 \
        [--config config.json] [--synthetic]
"""

from __future__ import annotations

import argparse
import dataclasses
import signal
import sys


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Train the TPU basecaller")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--config", default="", help="JSON config (default: flagship)")
    ap.add_argument("--steps", type=int, default=0, help="override train_steps")
    ap.add_argument("--data", default="", help="preprocessed .npz shard dir "
                    "(default: synthetic simulator)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init-npz", default="",
                    help="initialize params from a save_params_npz export "
                         "(shapes must match --config; e.g. a GQA warm start "
                         "from scripts/make_gqa_flagship.py)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--metrics", default="", help="JSONL metrics path")
    ap.add_argument("--tensorboard", default="",
                    help="TensorBoard event-file dir (optional secondary "
                         "sink, reference ReportMgr parity)")
    ap.add_argument("--report-every", type=int, default=50)
    ap.add_argument("--data-workers", type=int, default=1,
                    help="synthetic-generator worker threads (1 = single "
                         "deterministic producer behind a prefetch queue; "
                         ">1 interleaves per-seed streams for feed rate)")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nanodecoder_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    import jax.numpy as jnp

    from nanodecoder_tpu.config import Config
    from nanodecoder_tpu.models.model import init_model, param_count
    from nanodecoder_tpu.parallel.mesh import make_mesh_plan
    from nanodecoder_tpu.parallel.multihost import initialize_multihost
    from nanodecoder_tpu.train.checkpoint import CheckpointManager
    from nanodecoder_tpu.train.data import synthetic_batches, synthetic_valid_batches
    from nanodecoder_tpu.train.trainer import Trainer
    from nanodecoder_tpu.utils.logging import get_logger
    from nanodecoder_tpu.utils.report import ReportManager

    log = get_logger("train-cli")
    initialize_multihost()

    if args.config:
        with open(args.config) as f:
            config = Config.from_json(f.read())
    else:
        config = Config()
    if args.steps:
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train, train_steps=args.steps)
        )

    params = init_model(jax.random.PRNGKey(config.train.seed), config.model)
    if args.init_npz:
        from nanodecoder_tpu.train.checkpoint import load_params_npz

        params = load_params_npz(args.init_npz, params)
        log.info("initialized params from %s", args.init_npz)
    log.info("model: %.2fM params", param_count(params) / 1e6)

    plan = make_mesh_plan(config.mesh) if jax.device_count() > 1 else None
    report = ReportManager(report_every=args.report_every,
                           metrics_path=args.metrics or None,
                           tensorboard_dir=args.tensorboard or None)
    ckpt = CheckpointManager(args.ckpt_dir, config,
                             max_to_keep=config.train.keep_checkpoints)
    trainer = Trainer(config, params, report=report, checkpointer=ckpt,
                      mesh_plan=plan)

    if args.resume and ckpt.latest_step() is not None:
        trainer.state = ckpt.restore(trainer.state)

    if args.data:
        from nanodecoder_tpu.train.data import prefetch_batches
        from nanodecoder_tpu.train.shards import shard_batches

        if args.data_workers > 1:
            log.warning("--data-workers=%d is ignored with --data (shard "
                        "reading is single-producer); batches are still "
                        "prefetched behind a queue", args.data_workers)
        train_iter = prefetch_batches(shard_batches(args.data, config))
        valid_fn = None
    else:
        from nanodecoder_tpu.train.data import interleave_batches, prefetch_batches

        if args.data_workers > 1:
            seeds = tuple(config.train.seed + i for i in range(args.data_workers))
            train_iter = interleave_batches(config, seeds)
        else:
            train_iter = prefetch_batches(
                synthetic_batches(config, seed=config.train.seed)
            )
        valid_fn = lambda: iter(synthetic_valid_batches(config))  # noqa: E731

    if plan is not None:
        base = train_iter
        import jax.sharding as js

        spec = js.NamedSharding(plan.mesh, js.PartitionSpec(None, plan.data_axis))
        train_iter = (
            jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), b) for b in base
        )

    # SIGTERM -> KeyboardInterrupt so a terminated run still writes its
    # final checkpoint and shuts the TPU client down cleanly (an abrupt
    # exit leaves the device grant leased for ~25-30 min on this
    # environment's tunneled TPU — docs/PERF.md).
    signal.signal(signal.SIGTERM, lambda *_: (_ for _ in ()).throw(KeyboardInterrupt()))

    try:
        state = trainer.train(train_iter, valid_iter_fn=valid_fn)
    except KeyboardInterrupt:
        log.info("interrupted — saving checkpoint at step %d", int(trainer.state.step))
        state = trainer.state
    ckpt.save(int(state.step), state, wait=True)
    ckpt.close()
    report.close()
    return 0


if __name__ == "__main__":
    rc = main()
    # Hard-exit ONLY when a TPU backend is attached: that plugin's
    # atexit teardown has been observed to deadlock in a futex after
    # the final checkpoint was already durably written (wait=True) — a
    # hung trainer then holds the single device grant indefinitely.
    # All files main() owns are flushed/closed by this point.  On CPU
    # (or any non-TPU backend) normal interpreter teardown runs, so
    # logging handlers / third-party atexit hooks are not dropped
    # (ADVICE r3).
    import jax as _jax

    if _jax.default_backend() in ("tpu", "axon"):
        import os as _os

        sys.stdout.flush()
        sys.stderr.flush()
        _os._exit(rc)
    sys.exit(rc)
