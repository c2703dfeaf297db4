"""Serving engine + packet protocol tests."""
import numpy as np
import jax

from qmann_tpu.config import QmannConfig
from qmann_tpu.data import Dictionary, Sample, compute_dims
from qmann_tpu.models import memn2n
from qmann_tpu.serve import (
    InferenceEngine, IndexedSample, PacketDecoder, decode_response,
    encode_response, encode_sample, pack, unpack,
)


def test_packet_pack_unpack_roundtrip():
    for ptype in range(16):
        for addr in (0, 1, 63, 4095):
            t, a = unpack(pack(ptype, addr))
            assert (t, a) == (ptype, addr)


def test_packet_stream_roundtrip():
    s = IndexedSample(sentences=[[3, 4, 5], [6, 7]], te_indices=[21, 20],
                      question=[8, 9], answer=[4])
    data = encode_sample(s)
    decoded = PacketDecoder().feed(data)
    assert len(decoded) == 1
    d = decoded[0]
    assert d.sentences == s.sentences
    assert d.te_indices == s.te_indices
    assert d.question == s.question
    assert d.answer == s.answer


def test_packet_stream_incremental_feed():
    s = IndexedSample([[1, 2]], [10], [3], [2])
    data = encode_sample(s, train=True)
    dec = PacketDecoder()
    out = []
    for i in range(len(data)):
        out += dec.feed(data[i:i + 1])
    assert len(out) == 1 and out[0].question == [3]


def test_write_sample_bin_roundtrip(tmp_path):
    # EN_SAMPLE_BIN_OUT analog: whole-split dump file decodes back
    from qmann_tpu.serve import write_sample_bin
    samples = [IndexedSample([[3, 4, 5], [6, 7]], [21, 20], [8, 9], [4]),
               IndexedSample([[1, 2]], [10], [3], [2])]
    path = tmp_path / "qa1_test.bin"
    n = write_sample_bin(samples, str(path))
    data = path.read_bytes()
    assert n == len(data) and n > 0
    decoded = PacketDecoder().feed(data)
    assert [d.sentences for d in decoded] == [s.sentences for s in samples]
    assert [d.answer for d in decoded] == [s.answer for s in samples]


def test_response_roundtrip():
    data = encode_response(17) + encode_response(4)
    assert decode_response(data) == [17, 4]


def _toy_setup():
    samples = [
        Sample([["mary", "went", "home"], ["john", "went", "out"]],
               ["where", "is", "mary"], ["home"]),
        Sample([["john", "went", "out"]], ["where", "is", "john"], ["out"]),
    ]
    d = Dictionary.build(samples)
    dims = compute_dims(samples, d)
    cfg = QmannConfig(dim_emb=16, verbose=False)
    params = memn2n.init_params(cfg, dims, jax.random.PRNGKey(0))
    return cfg, dims, d, params


def test_inference_engine_end_to_end():
    cfg, dims, d, params = _toy_setup()
    eng = InferenceEngine(params, cfg, dims, d, batch_size=4,
                          max_wait_ms=1.0).start()
    try:
        futs = [eng.submit([["mary", "went", "home"]], ["where", "is", "mary"])
                for _ in range(6)]
        answers = [f.result(timeout=60) for f in futs]
        assert all(0 <= a < dims.dim_input for a in answers)
        # identical requests get identical answers
        assert len(set(answers)) == 1
        # answer resolves to a word
        assert isinstance(eng.answer_word(answers[0]) if
                          answers[0] < len(d) else "time-slot", str)
    finally:
        eng.stop()


def test_inference_engine_sharded_matches_single():
    """Engine over a device mesh must answer identically to the
    single-device engine (sharded serving path)."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from qmann_tpu.parallel import make_mesh
    cfg, dims, d, params = _toy_setup()
    story, q = [["mary", "went", "home"]], ["where", "is", "mary"]
    eng0 = InferenceEngine(params, cfg, dims, d, batch_size=4,
                           max_wait_ms=1.0).start()
    try:
        want = eng0.submit(story, q).result(timeout=60)
    finally:
        eng0.stop()
    mesh = make_mesh(8, model_parallelism=4)
    eng1 = InferenceEngine(params, cfg, dims, d, batch_size=4,
                           max_wait_ms=1.0, mesh=mesh).start()
    try:
        futs = [eng1.submit(story, q) for _ in range(6)]
        answers = [f.result(timeout=60) for f in futs]
        assert eng1.stats.failed_waves == 0
        assert set(answers) == {want}
    finally:
        eng1.stop()


def test_inference_engine_packet_path():
    cfg, dims, d, params = _toy_setup()
    eng = InferenceEngine(params, cfg, dims, d, batch_size=2,
                          max_wait_ms=1.0).start()
    try:
        idx = IndexedSample(
            sentences=[[d.lookup("mary"), d.lookup("went"), d.lookup("home")]],
            te_indices=[dims.dim_dict],
            question=[d.lookup("where"), d.lookup("is"), d.lookup("mary")],
            answer=[d.lookup("home")])
        stream = encode_sample(idx)
        decoded = PacketDecoder().feed(stream)
        fut = eng.submit_indexed(decoded[0])
        assert 0 <= fut.result(timeout=60) < dims.dim_input
    finally:
        eng.stop()


def test_packet_tcp_server_roundtrip():
    import socket
    from qmann_tpu.serve.server import serve

    cfg, dims, d, params = _toy_setup()
    eng = InferenceEngine(params, cfg, dims, d, batch_size=2,
                          max_wait_ms=1.0).start()
    server = serve(eng, port=0)
    host, port = server.server_address
    try:
        idx = IndexedSample(
            sentences=[[d.lookup("mary"), d.lookup("went"), d.lookup("home")]],
            te_indices=[dims.dim_dict],
            question=[d.lookup("where"), d.lookup("is"), d.lookup("mary")],
            answer=[d.lookup("home")])
        payload = encode_sample(idx) * 3  # three identical samples
        with socket.create_connection((host, port), timeout=30) as sock:
            sock.sendall(payload)
            got = b""
            while len(got) < 6:
                chunk = sock.recv(16)
                if not chunk:
                    break
                got += chunk
        answers = decode_response(got)
        assert len(answers) == 3
        assert len(set(answers)) == 1
    finally:
        server.shutdown()
        eng.stop()


def test_packet_client_end_to_end_stream():
    """Full serving loop: engine + TCP server + PacketClient streaming
    multiple samples, answers in order."""
    from qmann_tpu.serve.client import PacketClient
    from qmann_tpu.serve.server import serve

    cfg, dims, d, params = _toy_setup()
    eng = InferenceEngine(params, cfg, dims, d, batch_size=4,
                          max_wait_ms=1.0).start()
    server = serve(eng, port=0)
    host, port = server.server_address
    try:
        idx = IndexedSample(
            sentences=[[d.lookup("mary"), d.lookup("went"), d.lookup("home")]],
            te_indices=[dims.dim_dict],
            question=[d.lookup("where"), d.lookup("is"), d.lookup("mary")],
            answer=[d.lookup("home")])
        with PacketClient(host, port, timeout=120) as client:
            answers = client.query_samples([idx] * 5)
        assert len(answers) == 5
        assert len(set(answers)) == 1
    finally:
        server.shutdown()
        eng.stop()


def test_samples_from_split_roundtrip():
    from qmann_tpu.serve.client import samples_from_split
    from qmann_tpu.data import compute_dims, vectorize
    from qmann_tpu.data.babi import Sample as S, Dictionary as D
    raw = [S([["mary", "went", "home"], ["john", "went", "out"]],
             ["where", "is", "mary"], ["home"])]
    d = D.build(raw)
    dims = compute_dims(raw, d)
    v = vectorize(raw, d, dims)
    back = samples_from_split(v, dims)
    assert len(back) == 1
    s = back[0]
    assert sorted(s.sentences[0]) == sorted(
        d.lookup(w) for w in ["mary", "went", "home"])
    assert s.te_indices == [dims.dim_dict + 1, dims.dim_dict]
    assert s.answer == [d.lookup("home")]


def test_engine_stats_and_unprepared_parity():
    """EngineStats counters fill in, and the prepare=False engine (the
    engine_bench A/B baseline) answers identically to the prepared one."""
    cfg, dims, d, params = _toy_setup()
    req = ([["mary", "went", "home"]], ["where", "is", "mary"])
    answers = {}
    for prepare in (True, False):
        eng = InferenceEngine(params, cfg, dims, d, batch_size=4,
                              max_wait_ms=1.0, prepare=prepare).start()
        try:
            futs = [eng.submit(*req) for _ in range(6)]
            answers[prepare] = [f.result(timeout=60) for f in futs]
            st = eng.stats.snapshot()
            assert st["requests"] == 6
            assert 2 <= st["waves"] <= 6  # batch 4: at least two waves
            assert st["infer_s"] > 0.0 and st["vectorize_s"] > 0.0
            assert st["failed_waves"] == 0
        finally:
            eng.stop()
    assert (eng.prepared is None) and answers[True] == answers[False]


def test_engine_bench_pass_runner():
    """_run_pass drives an engine from multiple producers and returns a
    latency per request."""
    from qmann_tpu.bench.engine_bench import _run_pass
    from qmann_tpu.data.babi import Sample
    cfg, dims, d, params = _toy_setup()
    eng = InferenceEngine(params, cfg, dims, d, batch_size=4,
                          max_wait_ms=1.0).start()
    try:
        samples = [Sample([["mary", "went", "home"]],
                          ["where", "is", "mary"], ["home"])] * 10
        wall, lat = _run_pass(eng, samples, producers=3)
        assert wall > 0 and len(lat) == 10 and all(t > 0 for t in lat)
    finally:
        eng.stop()
