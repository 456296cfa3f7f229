"""Bridge between the repo's flax model and the reference torch model.

Provides:
  - import_reference_model(): import the reference modules with pyg stubs
  - make_ref_decoder(cfg): construct the reference InfGenAgentDecoder with
    hyperparameters mirroring a repo Config
  - transplant_agent_decoder(flax_params, ref): copy flax params into the
    torch module (the layer-level math maps 1:1; see tests/test_model.py)
  - build_ref_data(cfg, scenario, inputs, mt): convert a repo Scenario +
    ModelInputs into the HeteroData-dict the reference forward consumes

Used by tests/test_ref_parity.py (model-level parity) and
scripts/bench_reference.py (measured baseline).
"""

import numpy as np
import torch

from tests import pyg_stubs
from tests.ref_oracle import import_reference  # installs easydict/rich stubs


def import_reference_model():
    import_reference()          # sys.path + light stubs
    pyg_stubs.install()
    from infgen.modules import agent_decoder as ref_agent_decoder
    from infgen.modules import attr_tokenizer as ref_attr_tokenizer
    from infgen.modules import map_decoder as ref_map_decoder
    return ref_agent_decoder, ref_attr_tokenizer, ref_map_decoder


def make_ref_decoder(cfg, seed_size: int = 1):
    """Reference InfGenAgentDecoder at the repo Config's hyperparameters.

    Mirrors the constructor call in infgen/modules/infgen_decoder.py:30-60.
    """
    ref_ad, ref_attr, _ = import_reference_model()
    attr = ref_attr.Attr_Tokenizer(
        grid_range=cfg.grid_range, grid_interval=cfg.grid_interval,
        radius=cfg.pl2seed_radius, angle_interval=cfg.angle_interval)
    dec = ref_ad.InfGenAgentDecoder(
        dataset="waymo", input_dim=2, hidden_dim=cfg.hidden_dim,
        num_historical_steps=cfg.num_historical_steps, time_span=cfg.time_span,
        pl2a_radius=cfg.pl2a_radius, pl2seed_radius=cfg.pl2seed_radius,
        a2a_radius=cfg.a2a_radius, a2sa_radius=cfg.a2sa_radius,
        pl2sa_radius=cfg.pl2sa_radius, num_freq_bands=cfg.num_freq_bands,
        num_layers=cfg.num_agent_layers, num_heads=cfg.num_heads,
        head_dim=cfg.head_dim, dropout=cfg.dropout, token_size=cfg.token_size,
        attr_tokenizer=attr, predict_motion=True, predict_state=True,
        predict_map=cfg.predict_map, predict_occ=cfg.predict_occ,
        state_token={"invalid": 0, "valid": 1, "enter": 2, "exit": 3},
        use_grid_token=cfg.use_grid_token, use_head_token=cfg.use_head_token,
        use_state_token=cfg.use_state_token,
        disable_insertion=cfg.disable_insertion, seed_size=seed_size,
        buffer_size=cfg.buffer_size,
        num_recurrent_steps_val=cfg.num_recurrent_steps_val,
        loss_weight={"state_cls_loss": 10.0, "pos_cls_loss": 1.0,
                     "head_cls_loss": 1.0, "shape_reg_loss": 0.2,
                     "state_weight": [0.1, 0.1, 0.8],
                     "seed_state_weight": [0.9, 0.1],
                     "seed_type_weight": [0.8, 0.1, 0.1]},
        logger=None)
    dec.eval()
    # flax LayerNorm uses eps=1e-6; torch defaults to 1e-5
    for m in dec.modules():
        if isinstance(m, torch.nn.LayerNorm):
            m.eps = 1e-6
    return dec, attr


# --------------------------------------------------------------------- #
# parameter transplant (flax -> torch)
# --------------------------------------------------------------------- #

def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


def _copy_dense(fp, lin):
    lin.weight.data = _t(fp["kernel"]).T.contiguous()
    if "bias" in fp and lin.bias is not None:
        lin.bias.data = _t(fp["bias"])


def _copy_ln(fp, ln):
    ln.weight.data = _t(fp["scale"])
    ln.bias.data = _t(fp["bias"])
    ln.eps = 1e-6


def _copy_embed(fp, emb):
    emb.weight.data = _t(fp["embedding"])


def _copy_mlp_embedding(fp, tmod):
    """flax MLPEmbedding (Dense_0 LN_0 Dense_1 LN_1 Dense_2) -> torch
    MLPEmbedding.mlp Sequential indices 0,1,3,4,6 (layers.py:170-177)."""
    _copy_dense(fp["Dense_0"], tmod.mlp[0])
    _copy_ln(fp["LayerNorm_0"], tmod.mlp[1])
    _copy_dense(fp["Dense_1"], tmod.mlp[3])
    _copy_ln(fp["LayerNorm_1"], tmod.mlp[4])
    _copy_dense(fp["Dense_2"], tmod.mlp[6])


def _copy_mlp_layer(fp, tmod):
    """flax MLPLayer (Dense_0 LN_0 Dense_1) -> torch MLPLayer.mlp 0,1,3."""
    _copy_dense(fp["Dense_0"], tmod.mlp[0])
    _copy_ln(fp["LayerNorm_0"], tmod.mlp[1])
    _copy_dense(fp["Dense_1"], tmod.mlp[3])


def _copy_fourier(fp, tmod, input_dim):
    tmod.freqs.weight.data = _t(fp["freqs"])
    for i in range(input_dim):
        _copy_dense(fp[f"mlp_{i}_0"], tmod.mlps[i][0])
        _copy_ln(fp[f"mlp_{i}_ln"], tmod.mlps[i][1])
        _copy_dense(fp[f"mlp_{i}_1"], tmod.mlps[i][3])
    _copy_ln(fp["out_ln"], tmod.to_out[0])
    _copy_dense(fp["out_dense"], tmod.to_out[2])


def _copy_attention(fp, tmod, bipartite, has_pos_emb):
    _copy_ln(fp["prenorm_src"], tmod.attn_prenorm_x_src)
    if bipartite:
        _copy_ln(fp["prenorm_dst"], tmod.attn_prenorm_x_dst)
    _copy_dense(fp["to_q"], tmod.to_q)
    _copy_dense(fp["to_k"], tmod.to_k)
    _copy_dense(fp["to_v"], tmod.to_v)
    if has_pos_emb:
        _copy_ln(fp["prenorm_r"], tmod.attn_prenorm_r)
        tmod.to_k_r.weight.data = _t(fp["w_kr"]).T.contiguous()
        tmod.to_v_r.weight.data = _t(fp["w_vr"]).T.contiguous()
        tmod.to_v_r.bias.data = _t(fp["b_vr"])
    _copy_dense(fp["to_s"], tmod.to_s)
    _copy_dense(fp["to_g"], tmod.to_g)
    _copy_dense(fp["to_out"], tmod.to_out)
    _copy_ln(fp["postnorm"], tmod.attn_postnorm)
    _copy_ln(fp["ff_prenorm"], tmod.ff_prenorm)
    _copy_dense(fp["ff_0"], tmod.ff_mlp[0])
    _copy_dense(fp["ff_1"], tmod.ff_mlp[3])
    _copy_ln(fp["ff_postnorm"], tmod.ff_postnorm)


def transplant_agent_decoder(params, ref, cfg):
    """Copy repo AgentDecoder flax params into a reference InfGenAgentDecoder.

    `params`: the flax param dict of infgen_tpu.model.agent_decoder.AgentDecoder.
    """
    _copy_embed(params["type_a_emb"], ref.type_a_emb)
    _copy_mlp_embedding(params["shape_emb"], ref.shape_emb)
    _copy_embed(params["state_a_emb"], ref.state_a_emb)
    _copy_fourier(params["x_a_emb"], ref.x_a_emb, 2)
    _copy_fourier(params["r_t_emb"], ref.r_t_emb, 4)
    _copy_fourier(params["r_pt2a_emb"], ref.r_pt2a_emb, 3)
    _copy_fourier(params["r_a2a_emb"], ref.r_a2a_emb, 3)
    _copy_fourier(params["r_pt2sa_emb"], ref.r_pt2sa_emb, 3)
    _copy_fourier(params["r_a2sa_emb"], ref.r_a2sa_emb, 3)
    _copy_mlp_embedding(params["token_emb_veh"], ref.token_emb_veh)
    _copy_mlp_embedding(params["token_emb_ped"], ref.token_emb_ped)
    _copy_mlp_embedding(params["token_emb_cyc"], ref.token_emb_cyc)
    _copy_mlp_embedding(params["token_emb_grid"], ref.token_emb_grid)
    _copy_embed(params["no_token_emb"], ref.no_token_emb)
    _copy_embed(params["bos_token_emb"], ref.bos_token_emb)
    _copy_embed(params["invalid_offset_token_emb"], ref.invalid_offset_token_emb)
    _copy_mlp_embedding(params["fusion_emb"], ref.fusion_emb)

    for i in range(cfg.num_agent_layers):
        _copy_attention(params[f"t_attn_{i}"], ref.t_attn_layers[i], False, True)
        _copy_attention(params[f"pt2a_{i}"], ref.pt2a_attn_layers[i], True, True)
        _copy_attention(params[f"a2a_{i}"], ref.a2a_attn_layers[i], False, True)
    for i in range(cfg.num_seed_layers):
        _copy_attention(params[f"pt2sa_{i}"], ref.pt2sa_attn_layers[i], True, True)
        _copy_attention(params[f"a2sa_{i}"], ref.a2sa_attn_layers[i], False, True)
        _copy_attention(params[f"occ2sa_{i}"], ref.occ2sa_attn_layers[i], True, False)

    _copy_mlp_layer(params["token_predict_head"], ref.token_predict_head)
    _copy_mlp_layer(params["state_predict_head"], ref.state_predict_head)
    _copy_mlp_layer(params["seed_state_predict_head"], ref.seed_state_predict_head)
    _copy_mlp_layer(params["seed_type_predict_head"], ref.seed_type_predict_head)
    _copy_mlp_layer(params["seed_shape_predict_head"], ref.seed_shape_predict_head)
    if cfg.use_grid_token:
        _copy_mlp_layer(params["seed_pos_rel_token_predict_head"],
                        ref.seed_pos_rel_token_predict_head)
        _copy_mlp_layer(params["seed_offset_xy_predict_head"],
                        ref.seed_offset_xy_predict_head)
        _copy_mlp_layer(params["seed_agent_occ_embed"], ref.seed_agent_occ_embed)
    else:
        _copy_mlp_layer(params["seed_pos_rel_xy_predict_head"],
                        ref.seed_pos_rel_xy_predict_head)
    if cfg.use_head_token:
        _copy_mlp_layer(params["seed_heading_rel_token_predict_head"],
                        ref.seed_heading_rel_token_predict_head)
    else:
        _copy_mlp_layer(params["seed_heading_rel_theta_predict_head"],
                        ref.seed_heading_rel_theta_predict_head)
    if cfg.predict_occ:
        _copy_mlp_layer(params["grid_agent_occ_head"], ref.grid_agent_occ_head)
        _copy_mlp_layer(params["grid_pt_occ_head"], ref.grid_pt_occ_head)
    if "grid_index_head" in params:
        _copy_mlp_layer(params["grid_index_head"], ref.grid_index_head)


# --------------------------------------------------------------------- #
# data conversion (repo Scenario/ModelInputs -> reference HeteroData)
# --------------------------------------------------------------------- #

def build_ref_data(cfg, scenario, inputs, mt, num_agents=None, num_pt=None,
                   num_token_steps=None):
    """Reference-model `data` dict from the repo's tokenized inputs.

    Strips padding: pass num_agents/num_pt to keep only real rows (parity
    tests size max_agents == num_agents so the padded arrays align 1:1).
    num_token_steps truncates the 2 Hz token arrays to the rollout's
    num_infer_step — the repo rollout truncates the same way
    (closed_loop.py pad_t), while the reference only pads, never truncates
    (agent_decoder.py:1638-1645), and its `reshape(-1, num_infer_step, D)`
    silently misinterprets longer arrays as extra agent rows.
    Field inventory: agent_decoder.py forward (:1104-1180) + inference
    (:1605-1678) + map references to data['pt_token'].
    """
    npy = lambda x: np.asarray(x)
    An = num_agents if num_agents is not None else int(npy(scenario.agents.slot_mask).sum())
    P = num_pt if num_pt is not None else int(npy(scenario.map.mask).sum())
    tok = inputs.tokens
    Tt = num_token_steps if num_token_steps is not None \
        else npy(tok.token_idx).shape[1]

    data = pyg_stubs.FakeHeteroData()
    ag = data["agent"]
    ag["token_pos"] = _t(npy(tok.token_pos)[:An, :Tt]).float()
    ag["token_heading"] = _t(npy(tok.token_heading)[:An, :Tt]).float()
    ag["token_idx"] = _t(npy(tok.token_idx)[:An, :Tt]).long()
    ag["state_idx"] = _t(npy(tok.state_idx)[:An, :Tt]).long()
    ag["raw_agent_valid_mask"] = _t(npy(tok.raw_token_valid)[:An, :Tt]).bool()
    ag["type"] = _t(npy(inputs.agent_type)[:An]).long()
    T10 = npy(scenario.agents.valid).shape[1]
    ag["shape"] = _t(np.repeat(npy(inputs.agent_shape)[:An, None], T10, 1)).float()
    ag["av_index"] = torch.tensor([int(inputs.av_index)]).long()
    ag["grid_token_idx"] = _t(npy(inputs.grid_token_idx)[:An, :Tt]).long()
    ag["grid_offset_xy"] = _t(npy(inputs.grid_offset_xy)[:An, :Tt]).float()
    ag["heading_token_idx"] = _t(npy(inputs.heading_token_idx)[:An, :Tt]).long()
    ag["pos_xy"] = _t(npy(inputs.pos_xy)[:An]).float()
    ag["heading_theta"] = _t(npy(inputs.heading_theta)[:An]).float()
    ag["sort_indices"] = _t(npy(inputs.sort_indices)[:An]).long()
    ag["batch"] = torch.zeros(An, dtype=torch.long)
    ag["ptr"] = torch.tensor([0, An], dtype=torch.long)
    vocab = mt.vocab
    ag["trajectory_token_veh"] = _t(npy(vocab["veh"])).float()
    ag["trajectory_token_ped"] = _t(npy(vocab["ped"])).float()
    ag["trajectory_token_cyc"] = _t(npy(vocab["cyc"])).float()
    ag["pt_grid_token_idx"] = _t(npy(inputs.pt_grid_token_idx)[:, :P]).long()
    # inference-only fields
    ag["valid_mask"] = _t(npy(scenario.agents.valid)[:An]).bool()
    ag["id"] = torch.arange(An).long()
    ag["position"] = _t(npy(scenario.agents.position)[:An]).float()
    ag["heading"] = _t(npy(scenario.agents.heading)[:An]).float()
    ag["token_traj_all"] = _t(
        np.take(npy(mt.token_traj_all), np.clip(npy(inputs.agent_type)[:An], 0, 2),
                axis=0)).float()

    pt = data["pt_token"]
    pt["position"] = _t(npy(scenario.map.position)[:P]).float()
    pt["orientation"] = _t(npy(scenario.map.orientation)[:P]).float()
    pt["batch"] = torch.zeros(P, dtype=torch.long)
    pt["ptr"] = torch.tensor([0, P], dtype=torch.long)
    pt["num_nodes"] = P

    data["batch_size_a"] = torch.tensor([An]).long()
    data["ego_pos"] = ag["token_pos"][ag["av_index"]]
    data["scenario_id"] = ["parity"]
    return data
