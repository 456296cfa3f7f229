"""Round-trip test of the clean-room WOMD proto decoder + preprocessing tool.

Encodes a synthetic Scenario proto with a local wire-format encoder, decodes
it with infgen_tpu.data.womd_proto, converts to the pkl schema, and loads it
through the Waymo loader into model inputs.
"""

import struct

import numpy as np

from infgen_tpu.config import Config
from infgen_tpu.data.preprocess import decode_agents, decode_map, scenario_to_pkl_dict
from infgen_tpu.data.waymo import pkl_to_scenario
from infgen_tpu.data.womd_proto import parse_scenario
from infgen_tpu.tokenizers.map_tokenizer import MapTokenizer


# ---- minimal wire-format ENCODER (test-local) ----

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wt, payload):
    return _varint((num << 3) | wt) + payload


def _msg(num, payload):
    return _field(num, 2, _varint(len(payload)) + payload)


def _double(num, v):
    return _field(num, 1, struct.pack("<d", v))


def _float(num, v):
    return _field(num, 5, struct.pack("<f", v))


def _vint(num, v):
    return _field(num, 0, _varint(v))


def _object_state(x, y, heading, vx, vy, valid=True):
    return (_double(2, x) + _double(3, y) + _double(4, 0.0) +
            _float(5, 4.5) + _float(6, 2.0) + _float(7, 1.7) +
            _float(8, heading) + _float(9, vx) + _float(10, vy) +
            _vint(11, int(valid)))


def _track(tid, otype, xs, ys, headings, valid=None):
    states = b""
    for i, (x, y, h) in enumerate(zip(xs, ys, headings)):
        v = True if valid is None else valid[i]
        states += _msg(3, _object_state(x, y, h, 5.0, 0.0, v))
    return _vint(1, tid) + _vint(2, otype) + states


def _map_points(num, pts):
    out = b""
    for x, y in pts:
        out += _msg(num, _double(1, x) + _double(2, y) + _double(3, 0.0))
    return out


def make_scenario_bytes(T=91):
    t = np.arange(T) * 0.1
    tracks = b""
    # ego (vehicle) + a pedestrian + a late-entry vehicle
    tracks += _msg(2, _track(100, 1, 5 * t, np.zeros(T), np.zeros(T)))
    tracks += _msg(2, _track(101, 2, np.full(T, 10.0), 1.2 * t, np.full(T, np.pi / 2)))
    valid = [i >= 30 for i in range(T)]
    tracks += _msg(2, _track(102, 1, 5 * t + 20, np.full(T, 4.0), np.zeros(T), valid))
    # an unsupported "other" type track must be dropped
    tracks += _msg(2, _track(103, 4, np.zeros(T), np.zeros(T), np.zeros(T)))

    lane_pts = [(float(x), 0.0) for x in range(0, 120, 2)]
    lane = _msg(3, _double(1, 30.0) + _vint(2, 1) + _map_points(8, lane_pts))
    edge_pts = [(float(x), 6.0) for x in range(0, 120, 2)]
    edge = _msg(5, _vint(1, 1) + _map_points(2, edge_pts))
    map_features = _msg(8, _vint(1, 777) + lane) + _msg(8, _vint(1, 778) + edge)

    light = _msg(7, _msg(1, _vint(1, 777) + _vint(2, 4)))  # stop state on lane 777
    lights = light * 11  # one DynamicMapState per history step

    scen = (b"".join(_double(1, float(x)) for x in t[:5]) +
            tracks + map_features + lights +
            _msg(5, b"test_scene_001"[0:0] + b"test_scene_001") +
            _vint(6, 0) + _vint(10, 10) +
            _msg(11, _vint(1, 1)))
    return scen


def test_proto_roundtrip():
    raw = make_scenario_bytes()
    s = parse_scenario(raw)
    assert s["scenario_id"] == "test_scene_001"
    assert len(s["tracks"]) == 4
    assert s["tracks"][0]["object_type"] == 1
    assert len(s["tracks"][0]["states"]) == 91
    assert abs(s["tracks"][0]["states"][10]["x"] - 5.0) < 1e-6
    assert s["sdc_track_index"] == 0
    assert s["current_time_index"] == 10
    assert len(s["map_features"]) == 2
    assert s["map_features"][0]["feature_type"] == "lane"
    assert s["map_features"][0]["polyline"].shape == (60, 3)
    assert s["map_features"][1]["feature_type"] == "road_edge"
    assert s["tracks_to_predict"] == [1]
    assert s["dynamic_map_states"][10]["lane_states"][0]["lane"] == 777


def test_preprocess_to_model_inputs():
    raw = make_scenario_bytes()
    d = scenario_to_pkl_dict(raw)
    assert d is not None
    ag = d["agent"]
    assert ag["num_nodes"] == 3  # "other"-type track dropped
    assert ag["av_idx"] == 0
    assert ag["valid_mask"][2, :30].sum() == 0 and ag["valid_mask"][2, 30:].all()
    assert (ag["type"] == np.array([0, 1, 0])).all()
    # traffic light propagated to the lane polygon
    assert d["map_polygon"]["light_type"][0] == 1

    cfg = Config(max_agents=8, max_map_tokens=64)
    scen = pkl_to_scenario(d, cfg, MapTokenizer(), training=True)
    assert int(scen.agents.slot_mask.sum()) == 3
    assert bool(scen.map.mask.any())
    # lane split into ~5m pt tokens along 118m -> ~24 tokens per polyline
    assert 30 <= int(scen.map.mask.sum()) <= 64


def test_native_polyline_matches_python():
    from infgen_tpu.data import native
    from infgen_tpu.tokenizers.map_tokenizer import interpolate_polyline

    if not native.available():
        import pytest
        pytest.skip("native lib not built (no toolchain)")

    rng = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng.integers(5, 200))
        # mix of smooth lanes and ones with breaks
        t = np.cumsum(rng.uniform(0.5, 2.0, n))
        pts = np.stack([t, 3 * np.sin(t * 0.1)], -1)
        if trial % 2:
            pts[n // 2:] += 50.0  # force a gap break
        hd = np.arctan2(np.gradient(pts[:, 1]), np.gradient(pts[:, 0]))
        py = interpolate_polyline(pts, hd, use_native=False)
        nat = interpolate_polyline(pts, hd, use_native=True)
        if py is None:
            assert nat is None or nat.shape[0] == 0
            continue
        assert nat is not None and nat.shape == py.shape
        np.testing.assert_allclose(nat, py, atol=1e-4)


def test_native_tfrecord_index(tmp_path):
    import struct

    from infgen_tpu.data import native
    from infgen_tpu.data.womd_proto import iter_tfrecord

    if not native.available():
        import pytest
        pytest.skip("native lib not built")

    path = tmp_path / "test.tfrecord"
    payloads = [b"a" * 10, b"bb" * 50, b"xyz"]
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)) + b"\0" * 4 + p + b"\0" * 4)
    idx = native.tfrecord_index(str(path))
    assert len(idx) == 3
    with open(path, "rb") as f:
        for (off, ln), want in zip(idx, payloads):
            f.seek(off)
            assert f.read(ln) == want
    # python reader agrees
    assert list(iter_tfrecord(str(path))) == payloads


def test_cached_map_tokens_match_on_the_fly():
    """Offline map-token caching (scenario_to_pkl_dict map_tokenizer arg)
    produces exactly the arrays the loader would compute per access."""
    import numpy as np

    from infgen_tpu.data.waymo import tokenize_pkl_map

    raw = make_scenario_bytes()
    mt = MapTokenizer()
    d = scenario_to_pkl_dict(raw, mt)
    assert "map_token" in d
    fresh = tokenize_pkl_map(d, mt)
    for k in fresh:
        np.testing.assert_array_equal(np.asarray(d["map_token"][k]),
                                      np.asarray(fresh[k]), err_msg=k)

    # and the loader consumes the cache path end-to-end
    from infgen_tpu.config import Config
    from infgen_tpu.data.waymo import pkl_to_scenario
    cfg = Config(max_agents=8, max_map_tokens=64)
    scen = pkl_to_scenario(d, cfg, mt, training=False)
    assert scen.map.mask.sum() > 0
