"""MQ coder: round-trip across random context/bit streams, segment
termination, truncated-stream behavior."""

import numpy as np
import pytest

from qsvc_tpu.codec.mq import MQDecoder, MQEncoder, N_CONTEXTS


@pytest.mark.parametrize("n,seed", [(10, 0), (100, 1), (1000, 2), (5000, 3)])
def test_roundtrip_single_segment(n, seed):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, n).tolist()
    ctxs = rng.integers(0, N_CONTEXTS, n).tolist()
    enc = MQEncoder()
    for b, cx in zip(bits, ctxs):
        enc.encode(b, cx)
    enc.flush()
    data = enc.get_bytes()
    dec = MQDecoder(data)
    out = [dec.decode(cx) for cx in ctxs]
    assert out == bits


def test_roundtrip_biased_bits():
    # heavily-biased streams exercise the MPS/LPS state machine deeply
    rng = np.random.default_rng(7)
    bits = (rng.random(4000) < 0.02).astype(int).tolist()
    ctxs = rng.integers(0, 10, 4000).tolist()
    enc = MQEncoder()
    for b, cx in zip(bits, ctxs):
        enc.encode(b, cx)
    enc.flush()
    # compression sanity: biased stream should compress well below 1 bit/bit
    assert len(enc.get_bytes()) < 4000 / 8 / 2
    dec = MQDecoder(enc.get_bytes())
    assert [dec.decode(cx) for cx in ctxs] == bits


def test_multi_segment_roundtrip():
    rng = np.random.default_rng(11)
    segments = []
    enc = MQEncoder()
    for s in range(5):
        n = int(rng.integers(20, 200))
        bits = rng.integers(0, 2, n).tolist()
        ctxs = rng.integers(0, N_CONTEXTS, n).tolist()
        segments.append((bits, ctxs))
        for b, cx in zip(bits, ctxs):
            enc.encode(b, cx)
        enc.flush()
    data = enc.get_bytes()
    starts = enc.segment_starts
    dec = MQDecoder(data)
    for s, (bits, ctxs) in enumerate(segments):
        dec.start_segment(starts[s], starts[s + 1])
        assert [dec.decode(cx) for cx in ctxs] == bits, f"segment {s}"


def test_truncated_stream_decodes_prefix_segments():
    # dropping later segments must not break earlier ones
    rng = np.random.default_rng(13)
    enc = MQEncoder()
    all_seg = []
    for s in range(3):
        bits = rng.integers(0, 2, 150).tolist()
        ctxs = rng.integers(0, N_CONTEXTS, 150).tolist()
        all_seg.append((bits, ctxs))
        for b, cx in zip(bits, ctxs):
            enc.encode(b, cx)
        enc.flush()
    data = enc.get_bytes()
    starts = enc.segment_starts
    truncated = data[:starts[1]]          # keep only first segment
    dec = MQDecoder(truncated)
    bits, ctxs = all_seg[0]
    dec.start_segment(starts[0], starts[1])
    assert [dec.decode(cx) for cx in ctxs] == bits


# ITU-T T.88 Annex H.2 test data: the MQ coder shared by JBIG2 (T.88) and
# JPEG 2000 (T.800 Annex C) ships an official conformance vector — a
# 256-decision sequence, all on one context starting at state 0 / MPS 0,
# with its expected arithmetic-coded byte stream.
_T88_INPUT = bytes.fromhex(
    "00020051000000C00352872AAAAAAAAA82C02000FCD79EF6BF7FED904F46A3BF")
_T88_CODED = bytes.fromhex(
    "84C73BFCE1A1430402200000410DBB86F4317FFF88FF37471ADB6ADFFFAC")


def _t88_bits():
    return [(_T88_INPUT[i // 8] >> (7 - i % 8)) & 1 for i in range(256)]


def test_t88_spec_vector_decoder():
    """The spec decoder recovers every one of the 256 decisions from the
    official coded stream — external, authoritative evidence that the
    decode state machine (QE table transitions, MPS/LPS exchange, BYTEIN
    bit-stuffing) is conformant."""
    dec = MQDecoder(_T88_CODED)
    dec.ctx[0] = [0, 0]
    assert [dec.decode(0) for _ in range(256)] == _t88_bits()


def test_t88_spec_vector_encoder_prefix_and_decodability():
    """The encoder reproduces the spec's coded stream up to the point
    where its guarded byte-out diverges (a documented, spec-decodable
    deviation — see mq.py; OpenJPEG interop in test_j2k_interop.py is the
    cross-decoder evidence), and its own stream must still decode to the
    exact decision sequence."""
    enc = MQEncoder()
    enc.ctx[0] = [0, 0]
    for b in _t88_bits():
        enc.encode(b, 0)
    enc.flush()
    got = enc.get_bytes()
    assert got[:18] == _T88_CODED[:18]
    dec = MQDecoder(got)
    dec.ctx[0] = [0, 0]
    assert [dec.decode(0) for _ in range(256)] == _t88_bits()
