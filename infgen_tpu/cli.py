"""CLI entry point: train / validate / rollout.

Equivalent of the reference run.py:51-182, minus Lightning: modes dispatch to
the JAX train loop or the closed-loop rollout + WOSAC scoring.

  python -m infgen_tpu.cli train --config configs/ours_long_term.yaml --synthetic
  python -m infgen_tpu.cli rollout --config configs/ours_long_term.yaml --synthetic
"""

import argparse
import json
import os


class _ValOffset:
    """View of the tail of a synthetic dataset: held-out seeds for periodic
    validation (train seeds are [0, len); these are [size-k, size))."""

    def __init__(self, dataset, k: int):
        self._dataset = dataset
        self._base = len(dataset) - k
        self._k = k

    def __len__(self):
        return self._k

    def __getitem__(self, i: int):
        return self._dataset[self._base + i]


def main(argv=None):
    p = argparse.ArgumentParser("infgen_tpu")
    p.add_argument("mode", choices=["train", "validate", "rollout",
                                    "stream", "check-inputs", "export"])
    p.add_argument("--total_steps", type=int, default=900,
                   help="stream: total future 10 Hz frames to generate")
    p.add_argument("--fused_stream", action="store_true",
                   help="stream mode: run all segments as ONE compiled "
                        "program (on-device continuation; fixed capacity, "
                        "no re-bucketing between segments)")
    p.add_argument("--segment_steps", type=int, default=None,
                   help="stream: frames per compiled segment (default: "
                        "num_recurrent_steps_val)")
    p.add_argument("--out", default=None,
                   help="export: output artifact path (default "
                        "<save_dir>/rollout_a<A>.stablehlo)")
    p.add_argument("--open_loop", action="store_true",
                   help="validate: open-loop losses instead of rollouts")
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic scenario generator (no WOMD data)")
    p.add_argument("--data_dir", default=None, help="preprocessed WOMD pkl dir")
    p.add_argument("--save_dir", default="runs/default")
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--pretrain_ckpt", default=None,
                   help="weights-only non-strict warm start "
                        "(reference run.py --pretrain_ckpt)")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--num_scenarios", type=int, default=8)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--dump_rollouts", action="store_true",
                   help="save per-scenario rollout .npz for offline scoring")
    p.add_argument("--log_features", default=None,
                   help="aggregated GT log features (total_features.npz from "
                        "`python -m infgen_tpu.metrics.offline "
                        "--dump_log --aggregate_log`); default: aggregate "
                        "over the validation scenarios being rolled out")
    p.add_argument("--plot_rollouts", action="store_true")
    p.add_argument("--overfit", action="store_true",
                   help="overfit one batch (reference OVERFIT debug mode)")
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
        if args.overfit or os.environ.get("OVERFIT", "0") not in ("", "0"):
            # overfit-one-batch debug mode (reference OVERFIT env,
            # run.py:111-113: ONE fixed batch repeated for overfit_epochs).
            # Size by the GLOBAL batch (per-device x data-mesh devices):
            # train() consumes train_batch_size * n_dev items per step, and a
            # smaller dataset would yield zero batches per epoch.
            from infgen_tpu.train.loop import OverfitDataset
            tp = max(1, cfg.mesh_shape.get("model", 1))
            n_dev = cfg.mesh_shape.get("data", 0) \
                or jax.local_device_count() // tp
            dataset = OverfitDataset(
                dataset, max(cfg.train_batch_size, 1) * n_dev)
            cfg = cfg.replace(max_epochs=max(cfg.max_epochs, 100))
        # held-out validation set for periodic in-training validation +
        # best-k monitored checkpoints (train/loop.py)
        if cfg.val_every_n_epochs > 0:
            if args.synthetic or not args.data_dir:
                from infgen_tpu.train.loop import SyntheticDataset as _SD
                val_dataset = _ValOffset(_SD(cfg, size=10_000),
                                         cfg.val_num_scenarios)
            else:
                from infgen_tpu.data.waymo import WaymoDataset
                try:
                    val_dataset = WaymoDataset(args.data_dir, cfg,
                                               training=False)
                except Exception:
                    val_dataset = None
        else:
            val_dataset = None
        train(cfg, dataset, save_dir=args.save_dir, max_steps=args.max_steps,
              pretrain_ckpt=args.pretrain_ckpt, val_dataset=val_dataset)

    elif args.mode == "check-inputs":
        from infgen_tpu.train.loop import SyntheticDataset, check_inputs
        if args.synthetic or not args.data_dir:
            dataset = SyntheticDataset(cfg, size=args.num_scenarios)
        else:
            from infgen_tpu.data.waymo import WaymoDataset
            dataset = WaymoDataset(args.data_dir, cfg, training=False)
        check_inputs(cfg, dataset, args.num_scenarios)

    elif args.mode == "export":
        # AOT-export the rollout at the config's (A, P) capacity for
        # deployment without model code (rollout/export.py)
        from infgen_tpu.data.features import build_model_inputs
        from infgen_tpu.rollout.export import (
            export_rollout, save_rollout_artifact)
        from infgen_tpu.train.loop import SyntheticDataset
        from infgen_tpu.train.train_step import Trainer
        trainer = Trainer(cfg)
        if args.synthetic or not args.data_dir:
            scen = SyntheticDataset(cfg, size=1)[0]
        else:
            from infgen_tpu.data.waymo import WaymoDataset
            scen = WaymoDataset(args.data_dir, cfg, training=False)[0]
        state = trainer.init_state(jax.random.PRNGKey(cfg.seed), scen)
        params = state.params
        if args.ckpt_path:
            from infgen_tpu.train.checkpoint import CheckpointManager
            restored = CheckpointManager(args.ckpt_path).restore(
                jax.device_get(state))
            if restored is not None:
                params = restored.params
        rng = jax.random.PRNGKey(0)
        inputs = jax.jit(lambda s, r: build_model_inputs(
            cfg, trainer.motion_tok, trainer.attr, s, r))(scen, rng)
        blob = export_rollout(cfg, trainer.attr, trainer.motion_tok,
                              trainer.map_vocab, scen, inputs, rng, params)
        out = args.out or os.path.join(
            args.save_dir, f"rollout_a{cfg.max_agents}.stablehlo")
        save_rollout_artifact(out, blob)
        print(json.dumps({"artifact": out, "bytes": len(blob),
                          "max_agents": cfg.max_agents,
                          "max_map_tokens": cfg.max_map_tokens}))

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

    elif args.mode == "stream":
        # unbounded-horizon serving (rollout/streaming.py): chain the fixed
        # compiled segment, recycle exited agents' slots via compaction +
        # re-bucketing, stitch a global agent registry
        import numpy as np

        from infgen_tpu.rollout.serving import RolloutServer
        from infgen_tpu.rollout.streaming import StreamingRollout
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
            restored = CheckpointManager(args.ckpt_path).restore(
                jax.device_get(state))
            if restored is not None:
                state = restored

        seg = args.segment_steps or cfg.num_recurrent_steps_val
        if args.fused_stream:
            # one compiled program for the whole horizon: on-device
            # continuation + re-tokenization between segments, host only
            # stitches the result (rollout/streaming.py make_stream_fn)
            from infgen_tpu.rollout.streaming import (make_stream_fn,
                                                      stitch_stream_outputs)
            n_seg = -(-args.total_steps // seg)
            stream_fn = make_stream_fn(
                trainer.model, cfg, trainer.attr, trainer.motion_tok,
                trainer.map_vocab, segment_steps=seg, n_segments=n_seg)
            run_one = lambda scen, rng: stitch_stream_outputs(
                jax.device_get(stream_fn(state.params, scen, rng)),
                cfg.num_historical_steps)
        else:
            srv = RolloutServer(cfg, trainer.attr, trainer.motion_tok,
                                trainer.map_vocab, num_recurrent_steps=seg,
                                agent_buckets=(32, 64, cfg.max_agents))
            stream = StreamingRollout(srv, segment_steps=seg)
            run_one = lambda scen, rng: stream.run(
                state.params, scen, rng, total_steps=args.total_steps)
        os.makedirs(args.save_dir, exist_ok=True)
        for i in range(min(args.num_scenarios, len(dataset))):
            res = run_one(dataset[i],
                          jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                             i))
            G, F = res["state"].shape
            path = os.path.join(args.save_dir, f"stream_{i:06d}.npz")
            # scalars/lists too (ADVICE r4): without av_gid and the segment
            # boundaries the artifact can't identify the ego row or restitch
            np.savez_compressed(
                path,
                av_gid=np.int64(res["av_gid"]),
                frames_per_segment=np.asarray(res["frames_per_segment"],
                                              np.int64),
                segment_buckets=np.asarray(
                    [s["bucket"] for s in res["segments"]], np.int64),
                **{k: v for k, v in res.items()
                   if isinstance(v, np.ndarray)})
            print(f"scenario {i}: {F} frames ({len(res['segments'])} "
                  f"segments), {G} agents ever alive, buckets "
                  f"{[s['bucket'] for s in res['segments']]} -> {path}")

    elif args.mode in ("validate", "rollout"):
        import numpy as np

        from infgen_tpu.data.features import build_model_inputs
        from infgen_tpu.metrics.features import compute_metric_features
        from infgen_tpu.metrics.wosac import (
            WosacConfig, aggregate_scenario_metrics, compute_scenario_metrics,
            make_log_distributions)
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
        gt_feats_fn = jax.jit(lambda scen, inputs, re, rc: compute_metric_features(
            scen.agents.position[..., :2], scen.agents.heading,
            scen.agents.valid, scen.agents.shape[:, 0],
            scen.agents.shape[:, 1], scen.agents.slot_mask,
            scen.agents.av_index, inputs.tokens.token_pos,
            inputs.tokens.state_idx, re, rc,
            traj_z=scen.agents.elevation))
        sim_feats_fn = jax.jit(lambda o, re, rc: compute_metric_features(
            o["pred_traj"], o["pred_head"], o["pred_valid"],
            o["eval_shape"][:, 0], o["eval_shape"][:, 1], o["slot_active"],
            o["av_index"], o["pos_a"], o["next_state_idx"], re, rc))
        all_metrics = []
        # validation metric set (reference utils/metrics.py wired at
        # model/infgen.py:194-228,763-766): minADE/minFDE vs the logged GT
        # window, StateAccuracy, GridOverlapRate, NumInsertAccuracy
        from infgen_tpu.metrics.train_metrics import (
            grid_overlap_rate, min_ade, min_fde, min_multi_ade,
            min_multi_fde, num_insert_accuracy, state_accuracy)

        Hs = cfg.num_historical_steps
        grid_size = trainer.attr.grid_size

        @jax.jit
        def val_metrics_fn(scen, inputs, out):
            eval_mask = out["slot_active"] & scen.agents.valid[:, Hs - 1]
            To = min(scen.agents.position.shape[1] - Hs,
                     out["pred_traj"].shape[1] - Hs)
            gt = scen.agents.position[:, Hs:Hs + To, :2]
            pred = jax.lax.dynamic_slice_in_dim(out["pred_traj"], Hs, To, 1)
            vm = scen.agents.valid[:, Hs:Hs + To] & eval_mask[:, None]
            m = {}
            m["min_ade"] = min_ade(pred, gt, vm)
            m["min_fde"] = min_fde(pred, gt, vm)
            sa = state_accuracy(out["next_state_idx"])
            m["state_acc_valid"] = (sa["valid_sum"], sa["valid_count"])
            m["state_acc_invalid"] = (sa["invalid_sum"], sa["invalid_count"])
            go = grid_overlap_rate(out["next_state_idx"], out["grid_index"],
                                   grid_size, cfg.num_seed_feature)
            m["grid_overlap"] = (go["num_overlap_t"].sum(),
                                 go["num_insert_agent_t"].sum())
            Tg = min(inputs.tokens.state_idx.shape[1],
                     out["next_state_idx"].shape[1])
            m["num_insert_err"] = num_insert_accuracy(
                out["next_state_idx"][:, :Tg],
                inputs.tokens.state_idx[:, :Tg])
            return m

        @jax.jit
        def multi_metrics_fn(scen, pred_k):
            eval_mask = scen.agents.slot_mask & scen.agents.valid[:, Hs - 1]
            To = min(scen.agents.position.shape[1] - Hs,
                     pred_k.shape[2] - Hs)
            gt = scen.agents.position[:, Hs:Hs + To, :2]
            pk = jax.lax.dynamic_slice_in_dim(pred_k, Hs, To, 2)
            vm = scen.agents.valid[:, Hs:Hs + To] & eval_mask[:, None]
            return {"min_multi_ade": min_multi_ade(pk, gt, vm),
                    "min_multi_fde": min_multi_fde(pk, gt, vm)}

        val_totals = {}

        def _acc(m):
            for k, (s, n) in m.items():
                ts, tn = val_totals.get(k, (0.0, 0.0))
                val_totals[k] = (ts + float(s), tn + float(n))

        from infgen_tpu.metrics.map_distance import packed_road_edges

        # rank-sharded validation (reference: scenarios sharded across DDP
        # ranks with per-rank rollout files, model/infgen.py:594): with
        # --devices N, chunks of N scenarios run as ONE sharded batched
        # rollout over a data mesh
        n_shard = max(args.devices or 1, 1)
        use_shard = n_shard > 1 and n_roll == 1 and len(jax.devices()) >= n_shard
        if use_shard:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            from infgen_tpu.train.train_step import stack_scenarios
            mesh = Mesh(np.array(jax.devices()[:n_shard]), ("data",))
            shardp = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            build_many = jax.jit(jax.vmap(lambda s, r: build_model_inputs(
                cfg, trainer.motion_tok, trainer.attr, s, r)))
            rollout_many = jax.jit(
                jax.vmap(rollout_one, in_axes=(None, 0, 0, 0)),
                in_shardings=(repl, shardp, shardp, shardp))

        base_rng = jax.random.PRNGKey(cfg.seed + 1)

        # --- logged (GT) feature distribution, built ONCE for the whole
        # split (protocol of the reference offline flow: dump_log ->
        # aggregate_log -> total_features.pkl, compute_metrics.py:1590-1711;
        # LongMetric loads it at :1206-1217). Scoring each rollout against
        # per-scenario GT histograms is NOT reference-comparable.
        if args.log_features:
            from infgen_tpu.metrics.offline import _load_features
            log_feats_all = _load_features(args.log_features)
            print(f"loaded aggregated log features from {args.log_features}")
        built_cache = {}
        if not args.log_features:
            # fall back to aggregating over the scenarios being validated
            # (the split restricted to --num_scenarios); keep the built
            # inputs — scenario_stream consumes the identical (scen, rng)
            # pairs, so rebuilding them would double the input pipeline
            gt_parts = []
            for i in range(min(args.num_scenarios, len(dataset))):
                scen_i = dataset[i]
                inp_i = build(scen_i, jax.random.fold_in(base_rng, 2 * i))
                built_cache[i] = (scen_i, inp_i)
                gt_parts.append(jax.tree.map(
                    np.asarray, gt_feats_fn(scen_i, inp_i, None, None)))
            log_feats_all = jax.tree.map(
                lambda *xs: np.concatenate(xs, axis=0), *gt_parts)
        log_dist = log_dist_fn(log_feats_all)

        def scenario_stream():
            """Yield (i, scen, inputs, outs) per scenario."""
            idxs = list(range(min(args.num_scenarios, len(dataset))))
            if args.dump_rollouts:
                # resume: skip already-dumped scenarios BEFORE any compute,
                # in both the sequential and the sharded path
                # (model/infgen.py:593-601)
                idxs = [i for i in idxs if not os.path.exists(os.path.join(
                    args.save_dir, f"rollout_{i:06d}.npz"))]
            if not idxs:
                return
            if not use_shard:
                for i in idxs:
                    if i in built_cache:
                        scen, inputs = built_cache.pop(i)
                    else:
                        scen = dataset[i]
                        inputs = build(scen,
                                       jax.random.fold_in(base_rng, 2 * i))
                    r2 = jax.random.fold_in(base_rng, 2 * i + 1)
                    out = rollout(state.params, scen, inputs, r2)
                    if n_roll > 1:
                        yield i, scen, inputs, [
                            jax.tree.map(lambda x, k=k: x[k], out)
                            for k in range(n_roll)]
                    else:
                        yield i, scen, inputs, [out]
                return
            params_r = jax.device_put(jax.device_get(state.params), repl)
            for c0 in range(0, len(idxs), n_shard):
                chunk = idxs[c0:c0 + n_shard]
                pad = chunk + [chunk[-1]] * (n_shard - len(chunk))
                scens = [dataset[i] for i in pad]
                batch = stack_scenarios(scens)
                pj = np.asarray(pad)
                r1 = jax.vmap(lambda i: jax.random.fold_in(base_rng, 2 * i))(pj)
                r2 = jax.vmap(lambda i: jax.random.fold_in(base_rng, 2 * i + 1))(pj)
                inputs_b = build_many(batch, r1)
                outs_b = rollout_many(params_r, batch, inputs_b, r2)
                for j, i in enumerate(chunk):
                    yield (i, scens[j],
                           jax.tree.map(lambda x, j=j: x[j], inputs_b),
                           [jax.tree.map(lambda x, j=j: x[j], outs_b)])

        for i, scen, inputs, outs in scenario_stream():
            out = outs[0]
            dump_path = os.path.join(args.save_dir, f"rollout_{i:06d}.npz")
            road_edges, road_cyclic = packed_road_edges(scen.map)
            # resume semantics: don't overwrite existing dumps
            # (model/infgen.py:593-601)
            if args.dump_rollouts and not os.path.exists(dump_path):
                from infgen_tpu.metrics.offline import save_rollout_dump
                save_rollout_dump(dump_path, out, road_edges=road_edges,
                                  road_cyclic=road_cyclic)
            if args.plot_rollouts:
                from infgen_tpu.utils.visualization import plot_scenario_rollout
                plot_scenario_rollout(
                    f"scenario_{i:06d}", np.asarray(scen.map.position),
                    np.asarray(out["pred_traj"]), np.asarray(out["pred_head"]),
                    np.asarray(out["pred_state"]),
                    np.asarray(out["pred_type"]), int(out["av_index"]),
                    os.path.join(args.save_dir, "vis"),
                    slot_active=np.asarray(out["slot_active"]))
            if os.environ.get("PLOT_EDGE_INFERENCE"):
                # rollout-side edge-map debug plots (reference
                # PLOT_EDGE_INFERENCE env, agent_decoder.py:804): dense
                # attention masks rebuilt host-side from the rollout's
                # per-column pose/state with the same rules the scan uses
                from infgen_tpu.utils.visualization import plot_attention_masks
                pos_a = np.asarray(out["pos_a"])
                st_a = np.asarray(out["next_state_idx"])
                active = np.asarray(out["slot_active"])
                masks = {}
                for c in (2, pos_a.shape[1] // 2, pos_a.shape[1] - 1):
                    live = (st_a[:, c] != 0) & active
                    d2 = ((pos_a[:, c][:, None] - pos_a[:, c][None]) ** 2
                          ).sum(-1)
                    masks[f"a2a_col{c}"] = (
                        (d2 <= cfg.a2a_radius ** 2) & live[None] & live[:, None]
                        & ~np.eye(pos_a.shape[0], bool))
                plot_attention_masks(
                    f"rollout_{i:06d}", masks,
                    os.environ.get("PLOT_EDGE_DIR",
                                   os.path.join(args.save_dir, "edge_maps")))

            # concat features over rollouts along the agent axis like the
            # reference (compute_metrics.py:905-917)
            per_roll = [sim_feats_fn(o, road_edges, road_cyclic) for o in outs]
            sim_feats = jax.tree.map(
                lambda *xs: np.concatenate([np.asarray(x) for x in xs], 0),
                *per_roll)
            m = score_fn(log_dist, sim_feats)
            m = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v).tolist())
                 for k, v in m.items()}
            m["scenario"] = i
            m["n_inserted"] = int(out["n_inserted"])
            _acc(val_metrics_fn(scen, inputs, out))
            if n_roll > 1:
                pred_k = np.stack([np.asarray(o["pred_traj"]) for o in outs], 1)
                _acc(multi_metrics_fn(scen, pred_k))
            all_metrics.append(m)
            print(f"scenario {i}: metametric={m['metametric']:.4f} "
                  f"collision_rate={m['simulated_collision_rate']:.3f} "
                  f"offroad_rate={m['simulated_offroad_rate']:.3f} "
                  f"inserted={m['n_inserted']}")

        val_summary = {k: (s / n if n > 0 else 0.0)
                       for k, (s, n) in val_totals.items()}
        # scenario-set aggregation + bucketed summary (the reference's
        # LongMetric.compute schema, compute_metrics.py:1403-1453)
        wosac = aggregate_scenario_metrics(wcfg, all_metrics)
        with open(os.path.join(args.save_dir, "rollout_metrics.json"), "w") as f:
            json.dump({"wosac": wosac, "val_metrics": val_summary,
                       "scenarios": all_metrics}, f, indent=2)
        print("val metrics: " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(val_summary.items())))
        print("wosac buckets: " + " ".join(
            f"{k.split('/')[1]}={wosac[k]:.4f}" for k in (
                "wosac/realism_meta_metric", "wosac/kinematic_metrics",
                "wosac/interactive_metrics", "wosac/map_based_metrics",
                "wosac/placement_based_metrics")))
        print(f"realism metametric over {len(all_metrics)} scenarios "
              f"(split-aggregated log features): "
              f"{wosac['wosac/realism_meta_metric']:.4f}")


if __name__ == "__main__":
    main()
