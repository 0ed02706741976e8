"""BER-vs-SNR measurement harness.

The regression metric for demodulator quality (SURVEY.md §4): for each mode
configuration, modulate a known pseudo-random frame, add calibrated AWGN,
demodulate, and measure the bit error rate against the transmitted bits plus
the frame recovery rate. Usage::

    python benchmarks/ber.py [--modes QPSK,FSK1200] [--snrs 0,5,10,15,20]
        [--payload 2048] [--trials 3] [--out ber_results.json]

SNR here is in-band signal power over total noise power in the signal's
occupied bandwidth... kept simple and reproducible: SNR_dB = 10*log10(
signal_power / noise_power) over the full 48 kHz Nyquist band, which
understates effective SNR for narrowband modes — comparisons are meaningful
across runs of this harness, not across textbooks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu through jax.config: the axon tunnel plugin
# ignores the env var, and a wedged tunnel hangs any backend probe.
from audio_modem_radio_tpu.utils.jaxenv import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()
# The axon PJRT plugin registers itself from sitecustomize and IGNORES the
# JAX_PLATFORMS env var; honor it here so `JAX_PLATFORMS=cpu python ber.py`
# runs on the host even when a TPU tunnel is present (or wedged). Must run
# before the first jnp use anywhere in the process.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def _bit_errors(sent: bytes, received: bytes) -> float:
    """Fraction of differing bits over the aligned common prefix."""
    n = min(len(sent), len(received))
    if n == 0:
        return 1.0
    a = np.unpackbits(np.frombuffer(sent[:n], np.uint8))
    b = np.unpackbits(np.frombuffer(received[:n], np.uint8))
    return float(np.mean(a != b))


#: Printable-ASCII alphabet of the Hellschreiber font (ops/hell.py
#: char_map) used for the text-mode matrix rows.
_HELL_CHARSET = (
    " !\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~"
)

#: Text-mode families measured by char round-trip, not frame CRC: the
#: Hellschreiber wire carries glyph pixels with no framing or checksum
#: (reference hellschreiber.py:109-186), so "frame recovery" for these
#: rows means the decoded text matches the transmitted text exactly and
#: "ber" is the per-character error rate.
TEXT_MODES = ("HELLSCHREIBER", "SLOW_HELL", "FELD_HELL")


def measure_text_mode(
    mode: str,
    snr_db: float,
    n_chars: int = 160,
    trials: int = 3,
    seed: int = 0,
) -> Dict:
    """One (text mode, SNR) cell: char error rate + exact-text recovery.

    Fills the gap VERDICT r4 flagged: the HELL waterfall floor that drives
    the recommender (intelligence.MEASURED_MIN_SNR) previously came from an
    uncommitted side sweep; this puts the text-mode rows in the committed
    matrix artifact alongside the frame modes.
    """
    from audio_modem_radio_tpu.modem import demodulate, modulate

    rng = np.random.default_rng(seed)
    cers: List[float] = []
    recovered = 0
    for _ in range(trials):
        text = "".join(
            _HELL_CHARSET[i]
            for i in rng.integers(0, len(_HELL_CHARSET), n_chars)
        )
        wave = np.asarray(
            modulate(mode, text.encode("utf-8"), 4800), np.float64
        )
        p_sig = float(np.mean(wave**2))
        p_noise = p_sig / (10 ** (snr_db / 10))
        noisy = (wave + rng.normal(0, np.sqrt(p_noise), len(wave))).astype(
            np.float32
        )
        got = demodulate(mode, noisy, 4800).decode("utf-8", "ignore")
        if got == text:
            recovered += 1
            cers.append(0.0)
        else:
            n = min(len(got), len(text))
            errs = sum(a != b for a, b in zip(got[:n], text[:n]))
            errs += abs(len(got) - len(text))
            cers.append(errs / max(len(text), 1))
    return {
        "mode": mode,
        "snr_db": snr_db,
        "ber": float(np.mean(cers)),  # char error rate for text modes
        "frame_recovery_rate": recovered / trials,
        "trials": trials,
        "payload_len": n_chars,
        "symbol_rate": 4800,
        "text_mode": True,
    }


def measure_mode(
    mode: str,
    snr_db: float,
    payload_len: int = 2048,
    symbol_rate: int = 4800,
    trials: int = 3,
    seed: int = 0,
    fec: str = "",
) -> Dict:
    """One (mode, SNR) cell: returns BER and frame-recovery statistics.

    ``fec="conv"`` transmits the payload in a convolutional FECV container
    (rate 1/2, K=7) and measures the full receive ladder the decoder runs:
    strict parse -> hard Viterbi heal of damaged payloads -> soft-decision
    payload recovery (decoder.recover_payload_fec_soft). The row reports
    ``recovery_hard`` (parse or hard FEC) and ``frame_recovery_rate``
    (including the soft escalation) so the soft gain is visible per cell
    (VERDICT r3 #4 — the FSK9600@15 dB and 8PSK@5-10 dB cells).
    """
    from audio_modem_radio_tpu.framing import crc32, pack_frame, parse_frames
    from audio_modem_radio_tpu.modem import demodulate, modulate

    if mode in TEXT_MODES:
        # Text modes carry glyphs, not FBPC frames; measure char round-trip.
        # The frame-mode payload length maps to a char count (1 glyph/byte);
        # capped so a --payload sized for frame modes doesn't turn one HELL
        # cell into a minutes-long render. FEC doesn't apply (no FECV
        # container on the glyph wire) — reject rather than silently
        # measure a non-FEC cell into an FEC artifact.
        if fec:
            raise ValueError(f"{mode} carries glyphs, not FECV frames; --fec has no text-mode path")
        return measure_text_mode(
            mode, snr_db, n_chars=min(payload_len, 1024), trials=trials, seed=seed
        )
    if fec:
        from audio_modem_radio_tpu.decoder import recover_payload_fec_soft
        from audio_modem_radio_tpu.fec import unwrap_fec, wrap_fec
        from audio_modem_radio_tpu.framing import parse_frames_detailed

    rng = np.random.default_rng(seed)
    bers: List[float] = []
    recovered = 0
    recovered_hard = 0
    for t in range(trials):
        payload = rng.integers(0, 256, payload_len, dtype=np.uint8).tobytes()
        tx = wrap_fec(payload, "convolutional") if fec else payload
        framed = pack_frame("ber.bin", tx, 0, 1, payload_len, crc32(payload))
        wave = np.asarray(modulate(mode, framed, symbol_rate), np.float64)
        p_sig = float(np.mean(wave**2))
        p_noise = p_sig / (10 ** (snr_db / 10))
        noisy = (wave + rng.normal(0, np.sqrt(p_noise), len(wave))).astype(np.float32)

        raw = demodulate(mode, noisy, symbol_rate)
        if fec:
            frames, damaged = parse_frames_detailed(raw)
            got = None
            if frames:
                try:
                    got = unwrap_fec(frames[0].data)
                except Exception:
                    got = None
            if got != payload and damaged:
                try:
                    got = unwrap_fec(damaged[0].data)  # hard Viterbi heal
                except Exception:
                    got = None
            if got == payload:
                recovered_hard += 1
                recovered += 1
                bers.append(0.0)
                continue
            hard_try = got
            rec = recover_payload_fec_soft(
                raw, noisy, mode, symbol_rate, list(damaged)
            )
            if rec:
                try:
                    got = unwrap_fec(rec[0].data)
                except Exception:
                    got = None
            if got == payload:
                recovered += 1
                bers.append(0.0)
            else:
                bers.append(
                    _bit_errors(payload, hard_try or got or b"") if (hard_try or got)
                    else 0.5
                )
            continue
        frames = parse_frames(raw)
        if frames and frames[0].data == payload:
            recovered += 1
            bers.append(0.0)
        else:
            # Locate the payload region in the raw byte stream for a BER
            # estimate even when the frame CRC failed.
            idx = raw.find(b"FBPC")
            if idx >= 0:
                hdr = 4 + 1 + len("ber.bin") + 24
                bers.append(_bit_errors(payload, raw[idx + hdr :]))
            else:
                bers.append(0.5)  # no sync at all
    cell = {
        "mode": mode,
        "snr_db": snr_db,
        "ber": float(np.mean(bers)),
        "frame_recovery_rate": recovered / trials,
        "trials": trials,
        "payload_len": payload_len,
        "symbol_rate": symbol_rate,
    }
    if fec:
        cell["fec"] = fec
        cell["recovery_hard"] = recovered_hard / trials
    return cell


#: The round-5 regeneration matrix (VERDICT r4 next #1): the legacy
#: 0/5/10/15/20/30 grid every prior round used, PLUS half-step points
#: bracketing each family's measured waterfall so the coherent-tracked
#: receivers' ~2 dB gains are visible in the committed artifact, PLUS the
#: modes the old matrix lacked (HELLSCHREIBER text rows) and DSSS's
#: below-noise-floor grid.
MATRIX_GRIDS: Dict[str, List[float]] = {
    "QPSK": [0, 2.5, 5, 7.5, 10, 15, 20, 30],
    "BPSK": [-2.5, 0, 2.5, 5, 10, 15, 20, 30],
    "8PSK": [0, 2.5, 5, 7.5, 10, 12.5, 15, 20, 30],
    "FSK1200": [-3, 0, 2.5, 5, 10, 15, 20, 30],
    "FSK9600": [0, 5, 10, 12.5, 15, 17.5, 20, 30],
    "FSK19200": [0, 5, 10, 12.5, 15, 20, 30],
    "OFDM4": [0, 2.5, 5, 7.5, 10, 12.5, 15, 20, 30],
    "OFDM8": [0, 2.5, 5, 7.5, 10, 12.5, 15, 20, 30],
    "NEURAL": [0, 2.5, 5, 7.5, 10, 15, 20, 30],
    "DSSS": [-15, -12, -10.5, -9, -6, -3, 0, 5],
    "HELLSCHREIBER": [-3, 0, 1.5, 3, 5, 10, 20],
}


def run_matrix(payload_len: int, trials: int, fec: str = "") -> List[Dict]:
    """Run the full per-mode-grid waterfall matrix (MATRIX_GRIDS).

    ``fec`` forwards to every frame-mode cell (``--matrix --fec`` used to
    silently measure the hard path while naming the output
    ber_fec_results.json); text modes have no FECV container and are
    skipped from an FEC matrix."""
    results = []
    for mode, snrs in MATRIX_GRIDS.items():
        if fec and mode in TEXT_MODES:
            continue
        # Text-mode matrix rows pin the canonical 160-char operating point
        # (the committed ber_results_r5.json cells and the floors derived
        # from them) regardless of --payload, which sizes FRAME-mode cells;
        # use --modes/--payload explicitly for off-grid text measurements.
        cell_payload = 160 if mode in TEXT_MODES else payload_len
        for snr in snrs:
            cell = measure_mode(mode, float(snr), cell_payload, trials=trials, fec=fec)
            results.append(cell)
            print(
                f"{mode:14s} SNR {snr:6.1f} dB  BER {cell['ber']:.4f}  "
                f"frames {cell['frame_recovery_rate']:.0%}",
                flush=True,
            )
    return results


def run(modes: List[str], snrs: List[float], payload_len: int, trials: int,
        fec: str = "") -> List[Dict]:
    results = []
    for mode in modes:
        for snr in snrs:
            cell = measure_mode(mode, snr, payload_len, trials=trials, fec=fec)
            results.append(cell)
            extra = f"  hard {cell['recovery_hard']:.0%}" if fec else ""
            print(
                f"{mode:10s} SNR {snr:5.1f} dB  BER {cell['ber']:.4f}  "
                f"frames {cell['frame_recovery_rate']:.0%}{extra}",
                flush=True,
            )
    return results


def cfo_sweep(
    offsets_hz: List[float],
    snr_db: float = 20.0,
    payload_len: int = 1024,
    trials: int = 3,
) -> List[Dict]:
    """Frame recovery + BER vs carrier-frequency offset (tolerance curve).

    Narrowband configs (band fully positive, so an analytic-signal spectral
    shift is the physical mistuning model): QPSK 2400 Bd @ 6 kHz and
    BPSK 1200 Bd @ 3 kHz. The receivers absorb CFO via blind 4th-power
    derotation + quarter-turn sync retry (ops/psk.py).
    """
    from scipy.signal import hilbert

    from audio_modem_radio_tpu.framing import crc32, pack_frame, parse_frames
    from audio_modem_radio_tpu.ops.psk import (
        bpsk_demodulate,
        bpsk_modulate,
        qpsk_demodulate,
        qpsk_modulate,
    )

    configs = [
        ("QPSK 2400Bd c=6000", lambda d: qpsk_modulate(d, 2400, 6000.0),
         lambda s: qpsk_demodulate(s, 2400, 6000.0)),
        ("BPSK 1200Bd c=3000", lambda d: bpsk_modulate(d, 1200, 3000.0),
         lambda s: bpsk_demodulate(s, 1200, 3000.0)),
    ]
    results = []
    for name, mod, demod in configs:
        for df in offsets_hz:
            rng = np.random.default_rng(hash((name, df)) % (2**32))
            rec = 0
            for _ in range(trials):
                payload = rng.integers(0, 256, payload_len, dtype=np.uint8).tobytes()
                framed = pack_frame("cfo.bin", payload, 0, 1, payload_len, crc32(payload))
                wave = np.asarray(mod(framed), np.float64)
                z = hilbert(wave)
                shifted = np.real(
                    z * np.exp(2j * np.pi * df * np.arange(len(wave)) / 96000)
                )
                p_sig = float(np.mean(shifted**2))
                sigma = np.sqrt(p_sig / 10 ** (snr_db / 10))
                noisy = (shifted + rng.normal(0, sigma, len(shifted))).astype(np.float32)
                frames = parse_frames(demod(noisy))
                rec += bool(frames and frames[0].data == payload)
            results.append(
                {"config": name, "cfo_hz": df, "snr_db": snr_db,
                 "recovery": rec / trials, "trials": trials}
            )
            print(f"{name:>20} CFO {df:6.1f} Hz @ {snr_db} dB: recovery {rec}/{trials}",
                  flush=True)
    return results


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    # All 9 physical configs (VERDICT r2 #5 + the round-3 real D8PSK): the
    # sweep must include FSK9600/FSK19200 — the two configs with known
    # equalizer floors where a regression would actually hide (ops/fsk.py).
    ap.add_argument(
        "--modes",
        default="QPSK,BPSK,8PSK,FSK1200,FSK9600,FSK19200,OFDM4,OFDM8,NEURAL",
    )
    ap.add_argument("--snrs", default="0,5,10,15,20,30")
    ap.add_argument("--payload", type=int, default=2048)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default="ber_results.json")
    ap.add_argument("--cfo", action="store_true", help="run the CFO tolerance sweep instead")
    ap.add_argument("--matrix", action="store_true",
                    help="run the full per-mode-grid waterfall matrix (MATRIX_GRIDS)")
    ap.add_argument("--fec", action="store_true",
                    help="convolutional-FEC rows: hard + soft recovery ladder per cell")
    args = ap.parse_args()

    if args.cfo:
        results = cfo_sweep(
            [0, 15, 30, 60, 120, 240, 480], payload_len=args.payload, trials=args.trials
        )
        out = args.out if args.out != "ber_results.json" else os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "cfo_results.json"
        )
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out}")
        return 0

    if args.matrix:
        results = run_matrix(args.payload, args.trials, fec="conv" if args.fec else "")
    else:
        results = run(
            args.modes.split(","),
            [float(s) for s in args.snrs.split(",")],
            args.payload,
            args.trials,
            fec="conv" if args.fec else "",
        )
    default_name = "ber_fec_results.json" if args.fec else "ber_results.json"
    out_path = args.out if args.out != "ber_results.json" else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), default_name
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
