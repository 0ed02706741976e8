"""Sequence-parallel (sharded single capture) tests on the 8-device CPU mesh."""

import numpy as np
import pytest

from audio_modem_radio_tpu.framing import crc32, pack_frame, parse_frames
from audio_modem_radio_tpu.modem import modulate
from audio_modem_radio_tpu.parallel.mesh import get_mesh
from audio_modem_radio_tpu.parallel.sequence import decode_capture_sharded

PAYLOAD = bytes(b"sequence parallel decode across the mesh " * 24)


def _tx(mode="QPSK", rate=4800, data=PAYLOAD):
    framed = pack_frame("sp.bin", data, 0, 1, len(data), crc32(data))
    return np.asarray(modulate(mode, framed, rate), np.float32)


@pytest.mark.parametrize("mode,rate", [("QPSK", 4800), ("QPSK", 9600), ("BPSK", 4800)])
def test_sharded_capture_roundtrip(mode, rate):
    wave = _tx(mode, rate)
    raw = decode_capture_sharded(wave, mode, rate, get_mesh())
    frames = parse_frames(raw)
    assert frames and frames[0].data == PAYLOAD


def test_sharded_matches_single_device():
    from audio_modem_radio_tpu.ops.psk import qpsk_demodulate

    wave = _tx("QPSK", 4800)
    sharded = decode_capture_sharded(wave, "QPSK", 4800, get_mesh())
    single = qpsk_demodulate(wave, 4800, 3000.0)
    n = min(len(sharded), len(single))
    # Identical content over the common prefix (pad tails differ in length).
    assert sharded[:n] == single[:n]


def test_sharded_with_leading_silence():
    # A shard of pure silence must not derail the global offset consensus.
    wave = _tx("QPSK", 4800)
    padded = np.concatenate([np.zeros(len(wave), np.float32), wave])
    raw = decode_capture_sharded(padded, "QPSK", 4800, get_mesh())
    frames = parse_frames(raw)
    assert frames and frames[0].data == PAYLOAD


def test_unsupported_mode_raises():
    with pytest.raises(ValueError):
        decode_capture_sharded(np.zeros(96000, np.float32), "FSK1200", 1200, get_mesh())
