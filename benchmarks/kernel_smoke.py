"""On-chip Pallas-kernel smoke check (VERDICT r2 #10).

CI exercises the Pallas kernels only in interpreter mode (the suite runs on
CPU); real-Mosaic behavior on the TPU was validated solely by bench/driver
runs. This harness runs EVERY production kernel non-interpreted on the live
backend on a small real-signal workload and verifies the outputs against the
independent references:

  decide      psk_project_decide_batch (n_psk 2 and 4)  vs the XLA einsum
              projection + differential + derotate + decide tail, computed
              on the same device.
  qpsk_tail   rotation_match_batch + relabel_pack_batch (production wiring
              psk4_kernel_sync_tail)                    vs interpret=True.
  bpsk_tail   rotation_match_batch(family="bpsk") + bit_select_pack_batch
              (psk2_kernel_sync_tail)                   vs interpret=True.
  psk8_tail   sector_match_batch + psk8_relabel_pack_rows (production wiring
              psk8_kernel_sync_tail, round 4)           vs interpret=True.
  fsk_optin   fsk_project_bits_batch (opt-in kernel)    vs interpret=True.

Each entry records a pass/fail and a sha256 checksum of the non-interpreted
output so the committed artifact (KERNEL_SMOKE.json) pins the exact device
behavior per round.

PRODUCTION-SHAPE rows (VERDICT r3 #10): the small-shape rows above cannot
exercise grid edges at full row counts or VMEM pressure at bench tiling.
``--full`` adds one ``<mode>_full`` row per mode family that runs the FULL
fused production program (parallel.batch.demod_pack_batch) at the honest
bench's per-capture length (benchmarks/honest.py CONFIGS) on chip and
verifies end to end: sync found on every capture, the frame magic parses
out of capture 0's packed bytes, and a sha256 of those bytes pins the
device behavior. Batch is reduced 64->8 where honest.py uses 64: Pallas
grids here are (batch*rows/block,) — batch scales the number of identical
grid steps, while tile shapes, block edges and VMEM footprint are set by
the per-capture row geometry, which is kept at bench shape.

Run via ``python bench.py --smoke [--full]`` on the TPU; on a CPU backend
the non-interpreted kernels cannot run and the harness reports skipped=true.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu through jax.config: the axon tunnel plugin
# ignores the env var, and a wedged tunnel hangs any backend probe.
from audio_modem_radio_tpu.utils.jaxenv import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()
def _sha(*arrays) -> str:
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
    return h.hexdigest()[:16]


def _capture_batch(mode: str, rate: int, n_captures: int = 2, seed: int = 0):
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate

    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
    framed = pack_frame("smoke.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate(mode, framed, rate), np.float32)
    n = 1 << int(np.ceil(np.log2(len(wave))))
    batch = np.zeros((n_captures, n), np.float32)
    batch[:, : len(wave)] = wave
    return batch


def run_smoke() -> dict:
    import jax
    import jax.numpy as jnp

    out: dict = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    if jax.default_backend() != "tpu":
        out["skipped"] = True
        out["reason"] = "non-interpreted Pallas kernels need the TPU backend"
        return out

    from audio_modem_radio_tpu.ops.pallas_kernels import psk_project_decide_batch
    from audio_modem_radio_tpu.ops.psk import (
        _BLOCK_SYM,
        _batch_pass1,
        _blocked_templates,
        _decide_streams,
        _samples_per_symbol,
        derotate,
    )
    from audio_modem_radio_tpu.parallel.batch import (
        psk2_kernel_sync_tail,
        psk4_kernel_sync_tail,
    )

    baud, carrier, sr = 9600.0, 3000.0, 96000
    spsym = _samples_per_symbol(sr, baud)
    checks: dict = {}

    streams = {}
    for n_psk, mode in ((4, "QPSK"), (2, "BPSK")):
        batch = _capture_batch(mode, int(baud), seed=n_psk)
        b, n = batch.shape
        samples = jnp.asarray(batch)
        x3d, r, best, theta = _batch_pass1(
            samples, None, b, n // spsym, spsym, carrier, sr, 8, 0
        )
        W8 = jnp.asarray(_blocked_templates(spsym, carrier, sr, 8))
        rot = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)
        hi_k, lo_k = psk_project_decide_batch(
            x3d, W8, best, rot, rows_per_capture=r, n_psk=n_psk, block_rows=256
        )
        hi_k, lo_k = hi_k.reshape(b, -1), lo_k.reshape(b, -1)

        # Independent XLA reference on the same device.
        row = _BLOCK_SYM * spsym
        ov = W8.shape[1] - row
        x_next = jnp.concatenate(
            [x3d[:, 1:, :ov], jnp.zeros((b, 1, ov), jnp.float32)], axis=1
        )
        xov = jnp.concatenate([x3d, x_next], axis=2)
        proj = jnp.einsum("brc,bck->brk", xov, W8[best])
        re_f = proj[:, :, :_BLOCK_SYM].reshape(b, -1)
        im_f = proj[:, :, _BLOCK_SYM:].reshape(b, -1)
        d_re = re_f[:, 1:] * re_f[:, :-1] + im_f[:, 1:] * im_f[:, :-1]
        d_im = im_f[:, 1:] * re_f[:, :-1] - re_f[:, 1:] * im_f[:, :-1]
        d_re, d_im = derotate(d_re, d_im, theta)
        hi_x, lo_x = jax.vmap(lambda a, c: _decide_streams(a, c, n_psk))(d_re, d_im)
        n_sig = n // spsym - 2  # modulated span; pad-boundary ties excluded
        ok = bool(
            np.array_equal(np.asarray(hi_k)[:, :n_sig], np.asarray(hi_x)[:, :n_sig])
            and np.array_equal(np.asarray(lo_k)[:, :n_sig], np.asarray(lo_x)[:, :n_sig])
        )
        checks[f"decide_npsk{n_psk}"] = {"ok": ok, "sha": _sha(hi_k, lo_k)}
        streams[n_psk] = (hi_k, lo_k)

    # Sync tails: real Mosaic vs the interpreter on identical streams.
    for n_psk, tail, name in (
        (4, psk4_kernel_sync_tail, "qpsk_tail"),
        (2, psk2_kernel_sync_tail, "bpsk_tail"),
    ):
        hi, lo = streams[n_psk]
        dev = tail(hi, lo, cfo_retry=True)
        ref = tail(hi, lo, cfo_retry=True, interpret=True)
        ok = all(np.array_equal(np.asarray(a), np.asarray(c)) for a, c in zip(dev, ref))
        checks[name] = {"ok": bool(ok), "sha": _sha(*dev)}

    # D8PSK sync tail (round 4): Pallas sector matcher + fused relabel/pack
    # (production wiring psk8_kernel_sync_tail), real Mosaic vs interpreter
    # on an identical sector stream.
    try:
        from audio_modem_radio_tpu.ops.psk import (
            estimate_common_rotation_windows,
            psk8_sector_stream,
            psk_demod_streams_batch,
        )
        from audio_modem_radio_tpu.parallel.batch import (
            _MATCH_BLOCK_ROWS,
            psk8_kernel_sync_tail,
        )

        batch8 = _capture_batch("8PSK", int(baud), seed=11)
        # 8PSK's registered carrier is 12 kHz (modem.py MODES / batch.py
        # resolve_demod_plan), not the QPSK family's 3 kHz.
        d_re, d_im = psk_demod_streams_batch(
            jnp.asarray(batch8), baud, 12000.0, sr, n_psk=8
        )
        theta8 = estimate_common_rotation_windows(d_re, d_im, n_psk=8)
        d_re, d_im = derotate(d_re, d_im, theta8)
        sec = psk8_sector_stream(d_re, d_im)
        grain = 128 * _MATCH_BLOCK_ROWS
        m_pad = -(-sec.shape[1] // grain) * grain
        sec_p = jnp.pad(sec, ((0, 0), (0, m_pad - sec.shape[1])))
        dev = psk8_kernel_sync_tail(sec_p, cfo_retry=True)
        ref = psk8_kernel_sync_tail(sec_p, cfo_retry=True, interpret=True)
        ok = all(
            np.array_equal(np.asarray(a), np.asarray(c)) for a, c in zip(dev, ref)
        ) and bool(np.asarray(dev[2]).all())
        checks["psk8_tail"] = {"ok": bool(ok), "sha": _sha(*dev)}
    except Exception as e:
        checks["psk8_tail"] = {"ok": False, "error": repr(e)[:200]}

    # Round-5 fused n_psk=8 decide branch (the D8PSK front half): device
    # sectors vs the XLA projection+derotate+sector reference on the same
    # device with identical (best, rot) inputs.
    try:
        from audio_modem_radio_tpu.ops.psk import psk8_sector_stream as _sec8

        batch8d = _capture_batch("8PSK", int(baud), seed=13)
        b8, n8 = batch8d.shape
        s8 = jnp.asarray(batch8d)
        x3d8, r8, best8, th8 = _batch_pass1(
            s8, None, b8, n8 // spsym, spsym, 12000.0, sr, 8, 0, n_psk=8
        )
        W8c = jnp.asarray(_blocked_templates(spsym, 12000.0, sr, 8))
        rot8 = jnp.stack([jnp.cos(th8), jnp.sin(th8)], axis=1)
        sec_k = psk_project_decide_batch(
            x3d8, W8c, best8, rot8, rows_per_capture=r8, n_psk=8, block_rows=256
        ).reshape(b8, -1)
        row8 = _BLOCK_SYM * spsym
        ov8 = W8c.shape[1] - row8
        xf = x3d8.astype(jnp.float32)
        x_next8 = jnp.concatenate(
            [xf[:, 1:, :ov8], jnp.zeros((b8, 1, ov8), jnp.float32)], axis=1
        )
        xov8 = jnp.concatenate([xf, x_next8], axis=2)
        proj8 = jnp.einsum("brc,bck->brk", xov8, W8c[best8])
        re8 = proj8[:, :, :_BLOCK_SYM].reshape(b8, -1)
        im8 = proj8[:, :, _BLOCK_SYM:].reshape(b8, -1)
        dr8 = re8[:, 1:] * re8[:, :-1] + im8[:, 1:] * im8[:, :-1]
        di8 = im8[:, 1:] * re8[:, :-1] - re8[:, 1:] * im8[:, :-1]
        dr8, di8 = derotate(dr8, di8, th8)
        sec_x = _sec8(dr8, di8)
        n_sig8 = n8 // spsym - 2
        ok = bool(
            np.array_equal(
                np.asarray(sec_k)[:, :n_sig8], np.asarray(sec_x)[:, :n_sig8]
            )
        )
        checks["decide_npsk8"] = {"ok": ok, "sha": _sha(sec_k)}
    except Exception as e:
        checks["decide_npsk8"] = {"ok": False, "error": repr(e)[:200]}

    # Opt-in fused dual-tone FSK kernel (not the production path; PERF.md).
    try:
        from audio_modem_radio_tpu.ops.fsk import (
            _fsk_blocked_templates,
            _fsk_geometry,
            _samples_per_bit,
        )
        from audio_modem_radio_tpu.ops.pallas_kernels import fsk_project_bits_batch

        fbatch = _capture_batch("FSK1200", 1200, seed=7)
        spb = _samples_per_bit(sr, 1200)
        spr, frow, _ov = _fsk_geometry(spb)
        n_bits = fbatch.shape[1] // spb
        r = max(256, -(-(-(-n_bits // spr)) // 256) * 256)
        x3d = jnp.pad(
            jnp.asarray(fbatch[:, : n_bits * spb]),
            ((0, 0), (0, r * frow - n_bits * spb)),
        ).reshape(fbatch.shape[0], r, frow)
        Wf = jnp.asarray(_fsk_blocked_templates(spb, 1200.0, 2200.0, sr, 8))
        bestf = jnp.zeros((fbatch.shape[0],), jnp.int32)
        dev = fsk_project_bits_batch(x3d, Wf, bestf, rows_per_capture=r, spr=spr)
        ref = fsk_project_bits_batch(
            x3d, Wf, bestf, rows_per_capture=r, spr=spr, interpret=True
        )
        ok = np.array_equal(np.asarray(dev), np.asarray(ref))
        checks["fsk_optin"] = {"ok": bool(ok), "sha": _sha(dev)}
    except Exception as e:  # keep the artifact even if the opt-in path breaks
        checks["fsk_optin"] = {"ok": False, "error": repr(e)[:200]}

    # Production dual-tone FSK tile-store kernel (int16 rows), round 3.
    try:
        from audio_modem_radio_tpu.ops.fsk import (
            _fsk_geometry,
            _samples_per_bit,
            fsk_dual_bits_rows_batch,
        )
        from audio_modem_radio_tpu.parallel.batch import _overlap_rows

        fbatch = _capture_batch("FSK1200", 1200, seed=8)
        spb = _samples_per_bit(sr, 1200)
        spr, frow, fov = _fsk_geometry(spb)
        r = max(256, -(-(fbatch.shape[1] // spb // spr) // 256) * 256)
        rows_i = jnp.asarray(_overlap_rows(fbatch, r, frow, fov, dtype=np.int16))
        dev = fsk_dual_bits_rows_batch(rows_i, 1200.0, 1200.0, 2200.0, sr, kernel=True)
        ref = fsk_dual_bits_rows_batch(rows_i, 1200.0, 1200.0, 2200.0, sr, kernel=False)
        ok = np.array_equal(np.asarray(dev), np.asarray(ref))
        checks["fsk_tile"] = {"ok": bool(ok), "sha": _sha(dev)}
    except Exception as e:
        checks["fsk_tile"] = {"ok": False, "error": repr(e)[:200]}

    # Fused FSK discriminator (FSK9600) + mid-separation quadrature
    # (FSK19200) kernels, round 3: device bits vs the XLA fallback over the
    # modulated span (capture-tail pad bits legitimately differ — the
    # kernel's clamped final lookahead block sees different garbage).
    for name, mode, rate, cfg, shape_fn, bits_fn in (
        ("fsk_disc", "FSK9600", 9600, (9600.0, 1200.0, 2200.0), "fsk_disc_row_shape", "fsk_disc_bits_rows_batch"),
        ("fsk_quad", "FSK19200", 19200, (19200.0, 8000.0, 16000.0), "fsk_quad_row_shape", "fsk_quad_bits_rows_batch"),
    ):
        try:
            from audio_modem_radio_tpu.ops import fsk as fsk_ops
            from audio_modem_radio_tpu.ops.fsk import _samples_per_bit
            from audio_modem_radio_tpu.parallel.batch import _overlap_rows

            fbatch = _capture_batch(mode, rate, seed=9)
            baud_f, mark_f, space_f = cfg
            rs = getattr(fsk_ops, shape_fn)(fbatch.shape[1], baud_f, mark_f, space_f, sr)
            rr, rowl, rov, lead = rs
            rows_i = jnp.asarray(
                _overlap_rows(fbatch, rr, rowl, rov, lead=lead, dtype=np.int16)
            )
            fn = getattr(fsk_ops, bits_fn)
            dev = fn(rows_i, baud_f, mark_f, space_f, sr, kernel=True)
            ref = fn(rows_i, baud_f, mark_f, space_f, sr, kernel=False)
            n_sig = fbatch.shape[1] // _samples_per_bit(sr, baud_f) - 2
            ok = np.array_equal(
                np.asarray(dev)[:, :n_sig], np.asarray(ref)[:, :n_sig]
            )
            checks[name] = {"ok": bool(ok), "sha": _sha(np.asarray(dev)[:, :n_sig])}
        except Exception as e:
            checks[name] = {"ok": False, "error": repr(e)[:200]}

    # Fused NEURAL extraction kernel, round 3: device symbols vs the XLA
    # extraction over the payload span.
    try:
        from audio_modem_radio_tpu.ops.neural import (
            PREAMBLE_LEN,
            _chip_len,
            demod_td_batch,
            neural_mode_modulate,
        )

        rng = np.random.default_rng(10)
        payload = rng.integers(0, 256, 600, dtype=np.uint8)
        wave = np.asarray(neural_mode_modulate(payload.tobytes(), 9600), np.float32)
        n = 1 << 17
        nbatch = np.zeros((2, n), np.float32)
        nbatch[0, : len(wave)] = wave[:n]
        nbatch[1, 777 : 777 + len(wave)] = wave[: n - 777]
        cl = _chip_len(9600)
        dev = np.asarray(demod_td_batch(jnp.asarray(nbatch), cl, kernel=True))
        ref = np.asarray(demod_td_batch(jnp.asarray(nbatch), cl, kernel=False))
        n_use = PREAMBLE_LEN + len(payload)
        ok = np.array_equal(dev[:, :n_use], ref[:, :n_use])
        checks["neural_extract"] = {"ok": bool(ok), "sha": _sha(dev[:, :n_use])}
    except Exception as e:
        checks["neural_extract"] = {"ok": False, "error": repr(e)[:200]}

    out["checks"] = checks
    out["ok"] = all(c.get("ok") for c in checks.values())
    return out


# Production shapes: benchmarks/honest.py CONFIGS row geometry (symbol_rate,
# log2 per-capture samples, production kwargs); batch capped at 8 — grid
# steps repeat identically per capture, tile/VMEM geometry does not depend
# on batch (see module docstring).
FULL_CONFIGS = {
    "QPSK": (9600, 8, 24, {"cfo_retry": True}),
    "BPSK": (9600, 8, 24, {"cfo_retry": True}),
    "8PSK": (9600, 8, 22, {"cfo_retry": True}),
    "DSSS": (9600, 8, 22, {}),
    "FSK1200": (9600, 8, 23, {}),
    "FSK9600": (9600, 8, 23, {}),
    "FSK19200": (9600, 8, 23, {}),
    "OFDM4": (9600, 8, 22, {}),
    "OFDM8": (9600, 8, 22, {}),
    "NEURAL": (9600, 8, 22, {}),
    "HELLSCHREIBER": (9600, 8, 22, {}),
}


def run_full_smoke() -> dict:
    """One ``<mode>_full`` row per mode family: the fused production decode
    program (demod + sync + pack) at bench per-capture length, end-to-end
    verified on chip — every Pallas kernel runs at its production tiling."""
    import jax
    import jax.numpy as jnp

    out: dict = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}
    if jax.default_backend() != "tpu":
        out["skipped"] = True
        out["reason"] = "non-interpreted Pallas kernels need the TPU backend"
        return out

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from honest import _signal

    from audio_modem_radio_tpu.framing import parse_frames
    from audio_modem_radio_tpu.parallel.batch import demod_pack_batch, host_shape_batch

    # The exact payload/text honest._signal modulates (same rng stream).
    rng = np.random.default_rng(0)
    hell_text = "".join(chr(c) for c in rng.integers(33, 127, 512))
    payload = np.random.default_rng(0).integers(0, 256, 16384, dtype=np.uint8).tobytes()
    from audio_modem_radio_tpu.framing import crc32, pack_frame

    framed = pack_frame("bench.bin", payload, 0, 1, len(payload), crc32(payload))

    checks: dict = {}
    for mode, (srate, batch, p, kw) in FULL_CONFIGS.items():
        try:
            sig = _signal(mode, srate, 1 << p)
            one = host_shape_batch(sig[None], mode, srate)[0]
            xd = jnp.asarray(one)
            x = jnp.broadcast_to(xd, (batch,) + xd.shape) + 0
            idx = (0,) * (x.ndim - 1)
            _ = np.asarray(x[idx + (slice(0, 4),)])  # materialize sync
            packed, n_valid, found = demod_pack_batch(x, mode, srate, **kw)
            found_all = bool(np.asarray(found).all()) if mode != "NEURAL" else True
            nv0 = int(np.asarray(n_valid[0]))
            raw0 = np.asarray(packed[0][:nv0]).astype(np.uint8).tobytes()
            if mode == "HELLSCHREIBER":
                decoded_ok = hell_text[:100].encode("ascii", "ignore") in raw0
            else:
                frames = parse_frames(raw0)
                decoded_ok = any(f.data == payload for f in frames)
                if not decoded_ok:
                    # Slow modes (DSSS at baud/16 bit/s, FSK1200) cannot fit
                    # the 16 KB bench frame inside the bench capture length —
                    # honest._signal truncates mid-frame. The decode is still
                    # fully checkable: the packed stream must reproduce the
                    # transmitted frame bytes over the capture's whole bit
                    # capacity. n_valid modestly exceeds that capacity (byte
                    # packing past the stream end reads zero-pad), so allow a
                    # garbage tail of up to 256 bytes after the byte-exact
                    # prefix (measured: DSSS 52, FSK1200 205 — both exactly
                    # the post-capture pad span).
                    j = raw0.find(framed[:64])
                    if j >= 0:
                        span = min(len(raw0) - j, len(framed))
                        fa = np.frombuffer(framed[:span], np.uint8)
                        ra = np.frombuffer(raw0[j : j + span], np.uint8)
                        bad = np.nonzero(fa != ra)[0]
                        clean = int(bad[0]) if bad.size else span
                        decoded_ok = clean > 1000 and span - clean <= 256
            checks[f"{mode}_full"] = {
                "ok": bool(found_all and decoded_ok),
                "found_all": found_all,
                "frame_parse": bool(decoded_ok),
                "batch": batch,
                "n_samples": 1 << p,
                "sha": _sha(np.frombuffer(raw0, np.uint8)),
            }
        except Exception as e:
            checks[f"{mode}_full"] = {"ok": False, "error": repr(e)[:300]}
        print(json.dumps({f"{mode}_full": checks[f"{mode}_full"]}), flush=True)

    out["checks"] = checks
    out["ok"] = all(c.get("ok") for c in checks.values())
    return out


def main() -> int:
    result = run_smoke()
    if "--full" in sys.argv:
        full = run_full_smoke()
        result.setdefault("checks", {}).update(full.get("checks", {}))
        result["ok"] = bool(result.get("ok")) and bool(full.get("ok"))
        if full.get("skipped"):
            result["full_skipped"] = True
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "KERNEL_SMOKE.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0 if result.get("ok") or result.get("skipped") else 1


if __name__ == "__main__":
    raise SystemExit(main())
