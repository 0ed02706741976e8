"""FBPC wire-frame format: pack and parse.

This module defines the byte-level frame layout shared with the reference
implementation so that WAVs produced by either side decode on the other:

    b'FBPC' | u8 name_len | name (<=255 B utf-8) | LE u32 part_number
    | LE u32 total_parts | LE u32 file_size | LE u32 file_crc
    | LE u32 data_len | LE u32 part_crc | payload[data_len]

Layout and semantics follow the reference encoder's ``_frame_data``
(/root/reference/encoder.py:94-114) and the scan-all-magic-offsets parser with a
50 MB payload sanity bound and per-part CRC32 verification
(/root/reference/decoder.py:142-208). Unlike the reference parser — which drops
the part/total/file_size metadata on the floor and returns only
``{name, data, final_crc}``, breaking multi-part reassembly
(decoder.py:197-201 vs 249) — ``parse_frames`` returns the complete header so
the assembly layer actually works.
"""

from __future__ import annotations

import binascii
import struct
from dataclasses import dataclass
from typing import List

MAGIC = b"FBPC"
# First 16 bits of the magic, used by the demodulators for bit alignment
# (same pattern the reference searches for, /root/reference/modem.py:116-118).
MAGIC_BIT_PATTERN = "0100011001000010"
MAX_PAYLOAD = 50_000_000  # parser sanity bound (reference decoder.py:184)
_META = struct.Struct("<IIIIII")  # part, total, fsize, fcrc, dlen, pcrc


def crc32(data: bytes) -> int:
    return binascii.crc32(data) & 0xFFFFFFFF


@dataclass(frozen=True)
class Frame:
    """A parsed FBPC frame with its full header."""

    name: str
    data: bytes
    part_number: int
    total_parts: int
    file_size: int
    file_crc: int

    @property
    def is_multipart(self) -> bool:
        return self.total_parts > 1

    # Reference-parser-compatible accessor (decoder.py:197-201 keys the whole-
    # file CRC as 'final_crc').
    @property
    def final_crc(self) -> int:
        return self.file_crc


def pack_frame(
    name: str,
    data: bytes,
    part_number: int = 0,
    total_parts: int = 1,
    file_size: int = 0,
    file_crc: int = 0,
) -> bytes:
    """Serialize one frame. ``data`` is the (possibly compressed) payload."""
    name_b = name.encode("utf-8")[:255]
    part_crc = crc32(data)
    return b"".join(
        (
            MAGIC,
            bytes([len(name_b)]),
            name_b,
            _META.pack(part_number, total_parts, file_size, file_crc, len(data), part_crc),
            data,
        )
    )


def parse_frames(raw: bytes) -> List[Frame]:
    """Scan ``raw`` for every FBPC frame candidate and return CRC-valid frames.

    Searches every magic offset (overlapping offsets included), applies the
    header sanity checks, and keeps only frames whose payload CRC32 verifies —
    the same accept/reject policy as the reference parser, but returning the
    full header needed for multi-part reassembly.
    """
    return parse_frames_detailed(raw)[0]


def parse_frames_detailed(raw: bytes) -> tuple:
    """Like :func:`parse_frames` but also returns header-sane frames whose
    payload CRC failed — candidates for FEC recovery. Returns
    ``(valid_frames, damaged_frames)``."""
    frames: List[Frame] = []
    damaged: List[Frame] = []
    n = len(raw)
    offset = 0
    while True:
        start = raw.find(MAGIC, offset)
        if start == -1:
            break
        offset = start + 1

        # Minimum frame: magic(4) + name_len(1) + name(>=1) + meta(24)
        if start + 30 > n:
            continue
        name_len = raw[start + 4]
        if name_len == 0:
            continue
        name_start = start + 5
        meta_start = name_start + name_len
        if meta_start + _META.size > n:
            continue
        name = raw[name_start:meta_start].decode("utf-8", "ignore")
        part, total, fsize, fcrc, dlen, pcrc = _META.unpack(
            raw[meta_start : meta_start + _META.size]
        )
        if dlen == 0 or dlen > MAX_PAYLOAD:
            continue
        payload_start = meta_start + _META.size
        if payload_start + dlen > n:
            continue
        payload = raw[payload_start : payload_start + dlen]
        if total == 0 or part >= total:
            # Inconsistent part indices; reject rather than corrupt an
            # assembly slot.
            continue
        frame = Frame(name, payload, part, total, fsize, fcrc)
        if crc32(payload) == pcrc:
            frames.append(frame)
        else:
            damaged.append(frame)
    return frames, damaged
