"""Coherent-escalation policy invariants (round-5 review fixes).

Three properties the escalation must hold (modem._coherent_escalate):

1. UNION MERGE — whichever stream wins the ship decision, a CRC-valid
   frame the losing stream decoded is appended, never discarded (a tracker
   cycle slip must not throw away a frame differential detection already
   validated, and vice versa).
2. EVIDENCE GATE — a clean capture carrying one part of a multi-part file
   (the assembly registry's one-part-per-transmission flow) does NOT pay a
   tracked re-demod: escalation requires in-capture evidence (damaged
   frames, or more frame-magic occurrences than parsed frames).
3. BATCH REACHABILITY — decode_wav_batch escalates lost OFDM and DSSS
   captures through the round-5 tracked receivers, so a capture inside the
   tracked floors (the floors intelligence.MEASURED_MIN_SNR advertises)
   never decodes strictly worse in a batch than single-file.

Also pinned: the alias probe runs BEFORE the tracked pass for magic-less
captures (an alias capture must not pay a full tracked re-demod first).
"""

import numpy as np
import pytest

from audio_modem_radio_tpu.framing import crc32, pack_frame, parse_frames
from audio_modem_radio_tpu.modem import (
    _capture_complete,
    _coherent_escalate,
    _merge_valid,
)

BAUD, SR = 9600, 96000


def _packed(name, content, part=0, total=1):
    return pack_frame(name, content, part, total, len(content), crc32(content))


def test_merge_keeps_losing_streams_valid_frames():
    """raw validates part 0; tracked validates parts 1+2 (and corrupts
    part 0). The shipped stream must parse ALL THREE parts."""
    from audio_modem_radio_tpu.framing import MAGIC

    parts = [np.random.default_rng(i).integers(0, 256, 64, dtype=np.uint8).tobytes() for i in range(3)]
    fr = [_packed("m.bin", p, i, 3) for i, p in enumerate(parts)]
    # Part 0 valid, plus a dead frame START (in-capture evidence so the
    # escalation's evidence gate lets the tracked pass run).
    raw = fr[0] + MAGIC + b"\x00" * 40
    corrupt0 = bytearray(fr[0])
    corrupt0[-5] ^= 0xFF  # payload CRC now fails in the tracked stream
    tracked = bytes(corrupt0) + fr[1] + fr[2]

    out = _coherent_escalate(raw, lambda: tracked)
    got = {(f.part_number): f.data for f in parse_frames(out)}
    assert got == {0: parts[0], 1: parts[1], 2: parts[2]}


def test_merge_tie_ships_raw_plus_tracked_extras():
    """Tie on count: raw wins (zero risk on what parsed), but a DIFFERENT
    valid frame only the tracked stream carries is appended."""
    from audio_modem_radio_tpu.framing import MAGIC

    a = _packed("t.bin", b"A" * 50, 0, 2)
    b = _packed("t.bin", b"B" * 50, 1, 2)
    out = _coherent_escalate(a + MAGIC + b"\x00" * 8, lambda: b)
    got = {f.part_number: f.data for f in parse_frames(out)}
    assert got == {0: b"A" * 50, 1: b"B" * 50}
    # and raw's copy leads the stream (raw won the tie)
    assert out.startswith(a)


def test_merge_valid_noop_when_subset():
    frames = parse_frames(_packed("s.bin", b"x" * 20))
    assert _merge_valid(b"base", frames, frames) == b"base"


def test_evidence_gate_no_tracked_pass_on_clean_partial_capture():
    """One clean part of a 3-part file, no damaged frames, no extra magic:
    complete for this capture — tracked_fn must NOT run."""
    frame = _packed("p.bin", b"z" * 100, 1, 3)
    raw = b"\x01\x02" + frame + b"\x03\x04"
    calls = []

    def tracked_fn():
        calls.append(1)
        return b""

    out = _coherent_escalate(raw, tracked_fn)
    assert out == raw and not calls


def test_evidence_gate_extra_magic_triggers_tracked_pass():
    """Same capture plus an unparsed frame START (magic bytes whose frame
    body died): in-capture evidence — the tracked pass must run."""
    from audio_modem_radio_tpu.framing import MAGIC

    frame = _packed("p.bin", b"z" * 100, 1, 3)
    raw = frame + MAGIC + b"\x07" * 20  # magic with a dead header behind it
    calls = []

    def tracked_fn():
        calls.append(1)
        return b""

    out = _coherent_escalate(raw, tracked_fn)
    assert calls, "unparsed magic must escalate"
    assert out == raw  # tracked added nothing; raw still ships


def test_capture_complete_signature_cases():
    frame = parse_frames(_packed("c.bin", b"q" * 30))[0]
    assert _capture_complete([frame], [], _packed("c.bin", b"q" * 30))
    assert not _capture_complete([frame], [frame], b"")  # damaged -> incomplete


def _noisy(wave, snr_db, seed):
    rng = np.random.default_rng(seed)
    sigma = np.sqrt(np.mean(wave**2) / 10 ** (snr_db / 10.0))
    return (wave + rng.normal(0.0, sigma, len(wave))).astype(np.float32)


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _batch_decode_one(workdir, wave, mode, rate):
    from audio_modem_radio_tpu.parallel.batch import decode_wav_batch
    from audio_modem_radio_tpu.utils.wavio import write_wav

    wav = str(workdir / "cap.wav")
    write_wav(wav, wave, SR)
    return decode_wav_batch([wav], mode, rate, recv_dir=str(workdir / "recv"))


def test_batch_escalates_ofdm_through_tracked_receiver(workdir):
    """An OFDM4 capture at 7 dB (inside the tracked ~2 dB window: the
    differential receiver measures 0/6 seeds here, the tracked one 6/6 —
    tests/test_ofdm_tracked.py) must be recovered by decode_wav_batch via
    the lost-capture coherent escalation, not silently lost."""
    from audio_modem_radio_tpu.ops import ofdm
    from audio_modem_radio_tpu.utils.compression import intelligent_compress

    content = np.random.default_rng(3).integers(0, 256, 800, dtype=np.uint8).tobytes()
    framed = pack_frame(
        "o.bin", intelligent_compress(content), 0, 1, len(content), crc32(content)
    )
    wave = np.asarray(ofdm.ofdm_modulate(framed, BAUD, 12000.0, 4), np.float32)
    noisy = _noisy(wave, 7.0, seed=100)
    # Precondition (drop the SNR if a future receiver makes this pass):
    # the differential path alone must NOT decode this capture.
    assert not parse_frames(ofdm.ofdm_demodulate(noisy, BAUD, 12000.0, 4))

    out = _batch_decode_one(workdir, noisy, "OFDM4", BAUD)
    assert out[0], "batch lost a capture the tracked receiver decodes"
    with open(out[0][0], "rb") as f:
        assert f.read() == content


def test_batch_escalates_dsss_through_tracked_receiver(workdir):
    """A DSSS capture at -13 dB full-band SNR (the proven diff-fail /
    tracked-win point from tests/test_dsss_tracked.py — same frame bytes,
    baud, seed) must be recovered by decode_wav_batch via the
    despread-stream z^2 escalation. The payload rides untagged
    (intelligent_decompress's raw fallback), so the saved file is the
    payload byte-exact."""
    from audio_modem_radio_tpu.ops import dsss

    payload = np.random.default_rng(3).integers(0, 256, 300, dtype=np.uint8).tobytes()
    framed = pack_frame("d.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(dsss.dsss_real_modulate(framed, 4800, 3000.0, SR), np.float32)
    noisy = _noisy(wave, -13.0, seed=402)
    # Normalize below full scale BEFORE the int16 WAV write: at -13 dB the
    # noise peaks ~5x above the signal's full-scale waveform and would CLIP,
    # which is a different (and destroyed) capture. Common scaling leaves
    # the SNR unchanged.
    noisy = (noisy / np.max(np.abs(noisy)) * 0.98).astype(np.float32)
    assert not parse_frames(dsss.dsss_real_demodulate(noisy, 4800, 3000.0, SR))

    out = _batch_decode_one(workdir, noisy, "DSSS", 4800)
    assert out[0], "batch lost a capture the tracked despread receiver decodes"
    with open(out[0][0], "rb") as f:
        assert f.read() == payload


def test_alias_probe_runs_before_tracked_pass(monkeypatch):
    """A reference-alias 'OFDM' capture (single-carrier DQPSK wire) must be
    routed by the SHORT alias probe without paying a full-capture tracked
    re-demod first (VERDICT r2 weak #7's cost argument, applied to the
    round-5 escalation)."""
    from audio_modem_radio_tpu.modem import demodulate
    from audio_modem_radio_tpu.ops import ofdm as ofdm_ops

    content = b"alias probe order" * 10
    framed = _packed("a.bin", content)
    # The alias wire: what the reference's "OFDM" modes actually transmit.
    from audio_modem_radio_tpu.modem import ofdm_modulate_simple

    wave = np.asarray(ofdm_modulate_simple(framed, BAUD, 12000.0, 4), np.float32)

    def boom(*a, **k):
        raise AssertionError("tracked pass ran before the alias probe")

    monkeypatch.setattr(ofdm_ops, "ofdm_tracked_demodulate", boom)
    frames = parse_frames(demodulate("OFDM4", wave, BAUD))
    assert frames and frames[0].data == content


def test_batch_escalation_survives_degenerate_short_capture(workdir):
    """A lost capture shorter than the tracked receiver's per-mode minimum
    (OFDM needs three OFDM symbols) must stay lost, not crash the batch."""
    tiny = np.random.default_rng(0).normal(0, 0.1, 64).astype(np.float32)
    out = _batch_decode_one(workdir, tiny, "OFDM4", BAUD)
    assert out == [[]]
