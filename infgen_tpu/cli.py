"""CLI entry point: train / validate / rollout.

Equivalent of the reference run.py:51-182, minus Lightning: modes dispatch to
the JAX train loop or the closed-loop rollout + WOSAC scoring.

  python -m infgen_tpu.cli train --config configs/ours_long_term.yaml --synthetic
  python -m infgen_tpu.cli rollout --config configs/ours_long_term.yaml --synthetic
"""

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser("infgen_tpu")
    p.add_argument("mode", choices=["train", "validate", "rollout",
                                    "check-inputs"])
    p.add_argument("--open_loop", action="store_true",
                   help="validate: open-loop losses instead of rollouts")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic scenario generator (no WOMD data)")
    p.add_argument("--data_dir", default=None, help="preprocessed WOMD pkl dir")
    p.add_argument("--save_dir", default="runs/default")
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--num_scenarios", type=int, default=8)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--dump_rollouts", action="store_true",
                   help="save per-scenario rollout .npz for offline scoring")
    p.add_argument("--plot_rollouts", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        if args.devices:
            jax.config.update("jax_num_cpu_devices", args.devices)

    from infgen_tpu.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax

    from infgen_tpu.config import Config, load_config

    cfg = load_config(args.config) if args.config else Config()

    if args.mode == "train":
        from infgen_tpu.train.loop import SyntheticDataset, train
        if args.synthetic or not args.data_dir:
            dataset = SyntheticDataset(cfg)
        else:
            from infgen_tpu.data.waymo import WaymoDataset
            dataset = WaymoDataset(args.data_dir, cfg, training=True)
        train(cfg, dataset, save_dir=args.save_dir, max_steps=args.max_steps)

    elif args.mode == "check-inputs":
        from infgen_tpu.train.loop import SyntheticDataset, check_inputs
        if args.synthetic or not args.data_dir:
            dataset = SyntheticDataset(cfg, size=args.num_scenarios)
        else:
            from infgen_tpu.data.waymo import WaymoDataset
            dataset = WaymoDataset(args.data_dir, cfg, training=False)
        check_inputs(cfg, dataset, args.num_scenarios)

    elif args.mode == "validate" and (args.open_loop or cfg.val_open_loop):
        from infgen_tpu.train.loop import SyntheticDataset, validate_open_loop
        from infgen_tpu.train.train_step import Trainer
        trainer = Trainer(cfg)
        if args.synthetic or not args.data_dir:
            dataset = SyntheticDataset(cfg, size=args.num_scenarios)
        else:
            from infgen_tpu.data.waymo import WaymoDataset
            dataset = WaymoDataset(args.data_dir, cfg, training=False)
        state = trainer.init_state(jax.random.PRNGKey(cfg.seed), dataset[0])
        if args.ckpt_path:
            from infgen_tpu.train.checkpoint import CheckpointManager
            restored = CheckpointManager(args.ckpt_path).restore(
                jax.device_get(state))
            if restored is not None:
                state = restored
        validate_open_loop(trainer, state, dataset, args.num_scenarios)

    elif args.mode in ("validate", "rollout"):
        import numpy as np

        from infgen_tpu.data.features import build_model_inputs
        from infgen_tpu.metrics.features import compute_metric_features
        from infgen_tpu.metrics.wosac import (
            WosacConfig, compute_scenario_metrics, make_log_distributions)
        from infgen_tpu.rollout.closed_loop import make_rollout_fn
        from infgen_tpu.train.train_step import Trainer

        trainer = Trainer(cfg)
        if args.synthetic or not args.data_dir:
            from infgen_tpu.train.loop import SyntheticDataset
            dataset = SyntheticDataset(cfg, size=args.num_scenarios)
        else:
            from infgen_tpu.data.waymo import WaymoDataset
            dataset = WaymoDataset(args.data_dir, cfg, training=False)

        state = trainer.init_state(jax.random.PRNGKey(cfg.seed), dataset[0])
        if args.ckpt_path:
            from infgen_tpu.train.checkpoint import CheckpointManager
            ckpt = CheckpointManager(args.ckpt_path)
            restored = ckpt.restore(jax.device_get(state))
            if restored is not None:
                state = restored
                print(f"loaded checkpoint step {int(np.asarray(state.step))}")

        n_roll = max(cfg.n_rollout_close_val, 1)
        rollout_one = make_rollout_fn(trainer.model, cfg, trainer.attr,
                                      trainer.motion_tok, trainer.map_vocab,
                                      jit=False)
        if n_roll > 1:
            # the reference stacks n_rollout rollouts per scenario
            # (model/infgen.py:791-835); we vmap over rng
            rollout = jax.jit(lambda p, s, i, r: jax.vmap(
                lambda rr: rollout_one(p, s, i, rr))(jax.random.split(r, n_roll)))
        else:
            rollout = jax.jit(rollout_one)
        build = jax.jit(lambda s, r: build_model_inputs(
            cfg, trainer.motion_tok, trainer.attr, s, r))

        os.makedirs(args.save_dir, exist_ok=True)
        wcfg = WosacConfig()
        # jit the scoring: it is pure jnp and eager dispatch is costly on
        # remote TPU backends
        log_dist_fn = jax.jit(lambda f: make_log_distributions(wcfg, f))
        score_fn = jax.jit(lambda ld, sf: compute_scenario_metrics(wcfg, ld, sf))
        gt_feats_fn = jax.jit(lambda scen, inputs: compute_metric_features(
            scen.agents.position[..., :2], scen.agents.heading,
            scen.agents.valid, scen.agents.shape[:, 0],
            scen.agents.shape[:, 1], scen.agents.slot_mask,
            scen.agents.av_index, inputs.tokens.token_pos,
            inputs.tokens.state_idx))
        sim_feats_fn = jax.jit(lambda o: compute_metric_features(
            o["pred_traj"], o["pred_head"], o["pred_valid"],
            o["eval_shape"][:, 0], o["eval_shape"][:, 1], o["slot_active"],
            o["av_index"], o["pos_a"], o["next_state_idx"]))
        rng = jax.random.PRNGKey(cfg.seed + 1)
        all_metrics = []
        for i in range(min(args.num_scenarios, len(dataset))):
            scen = dataset[i]
            rng, r1, r2 = jax.random.split(rng, 3)
            # resume: skip scenarios already dumped (model/infgen.py:593-601)
            dump_path = os.path.join(args.save_dir, f"rollout_{i:06d}.npz")
            if args.dump_rollouts and os.path.exists(dump_path):
                continue
            inputs = build(scen, r1)
            out = rollout(state.params, scen, inputs, r2)
            if n_roll > 1:
                outs = [jax.tree.map(lambda x: x[k], out) for k in range(n_roll)]
                out = outs[0]
            else:
                outs = [out]
            if args.dump_rollouts:
                from infgen_tpu.metrics.offline import save_rollout_dump
                save_rollout_dump(dump_path, out)
            if args.plot_rollouts:
                from infgen_tpu.utils.visualization import plot_scenario_rollout
                plot_scenario_rollout(
                    f"scenario_{i:06d}", np.asarray(scen.map.position),
                    np.asarray(out["pred_traj"]), np.asarray(out["pred_head"]),
                    np.asarray(out["pred_state"]),
                    np.asarray(out["pred_type"]), int(out["av_index"]),
                    os.path.join(args.save_dir, "vis"),
                    slot_active=np.asarray(out["slot_active"]))

            # log (GT) features from the scenario itself as the reference
            # distribution for a self-contained score
            log_dist = log_dist_fn(gt_feats_fn(scen, inputs))

            # concat features over rollouts along the agent axis like the
            # reference (compute_metrics.py:905-917)
            per_roll = [sim_feats_fn(o) for o in outs]
            sim_feats = jax.tree.map(
                lambda *xs: np.concatenate([np.asarray(x) for x in xs], 0),
                *per_roll)
            m = score_fn(log_dist, sim_feats)
            m = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v).tolist())
                 for k, v in m.items()}
            m["scenario"] = i
            m["n_inserted"] = int(out["n_inserted"])
            all_metrics.append(m)
            print(f"scenario {i}: metametric={m['metametric']:.4f} "
                  f"collision_rate={m['simulated_collision_rate']:.3f} "
                  f"inserted={m['n_inserted']}")

        with open(os.path.join(args.save_dir, "rollout_metrics.json"), "w") as f:
            json.dump(all_metrics, f, indent=2)
        mean_meta = float(np.mean([m["metametric"] for m in all_metrics]))
        print(f"mean metametric over {len(all_metrics)} scenarios: {mean_meta:.4f}")


if __name__ == "__main__":
    main()
