"""Multi-part assembly and reception-stats tests."""

import time

import pytest

from audio_modem_radio_tpu.assembly import AssemblyRegistry, FileAssembly
from audio_modem_radio_tpu.framing import Frame, crc32


def _mk_frames(name: str, data: bytes, n_parts: int):
    size = len(data)
    fcrc = crc32(data)
    step = (size + n_parts - 1) // n_parts
    return [
        Frame(f"{name}.part{i+1}", data[i * step : (i + 1) * step], i, n_parts, size, fcrc)
        for i in range(n_parts)
    ]


def test_out_of_order_reassembly():
    data = bytes(range(256)) * 10
    frames = _mk_frames("f.bin", data, 4)
    reg = AssemblyRegistry()
    results = [reg.offer(f) for f in (frames[2], frames[0], frames[3], frames[1])]
    assert results[:3] == [None, None, None]
    assert results[3] == data


def test_quality_based_duplicate_replacement():
    asm = FileAssembly("f", 2, 100, 0)
    bad = b"\x00" * 50  # all zeros -> quality 0
    good = bytes(range(50))
    assert not asm.add_part(0, bad)
    assert asm.parts[0] == bad
    # higher-quality retransmission replaces the bad part
    asm.add_part(0, good)
    assert asm.parts[0] == good
    # a worse retransmission does not
    asm.add_part(0, bad)
    assert asm.parts[0] == good


def test_signal_quality_heuristic():
    q_zero = FileAssembly.calculate_signal_quality(b"\x00" * 100)
    q_rep = FileAssembly.calculate_signal_quality(b"abcde" * 100)
    q_rich = FileAssembly.calculate_signal_quality(bytes(range(256)))
    assert q_zero == 0.0
    assert q_rich > q_rep
    assert FileAssembly.calculate_signal_quality(b"") == 0.0


def test_bad_final_crc_keeps_assembly_alive_for_healing():
    data = bytes(range(200))
    frames = _mk_frames("f.bin", data, 2)
    # corrupt part 1's payload but claim the original file CRC
    corrupt = Frame(frames[1].name, b"\xff" * len(frames[1].data), 1, 2, len(data), crc32(data))
    reg = AssemblyRegistry()
    assert reg.offer(frames[0]) is None
    assert reg.offer(corrupt) is None  # complete but CRC-bad -> held for healing
    # the genuine part heals it
    assert reg.offer(frames[1]) == data


def test_expiry_purge():
    reg = AssemblyRegistry(timeout_seconds=0)
    frames = _mk_frames("slow.bin", b"x" * 100, 3)
    reg.offer(frames[0])
    time.sleep(0.01)
    assert reg.purge_expired()
    assert reg.get_status() == []


def test_progress_and_missing():
    asm = FileAssembly("f", 4, 100, 0)
    asm.add_part(1, b"bb")
    asm.add_part(3, b"dd")
    assert asm.get_progress() == 50.0
    assert asm.get_missing_parts() == [0, 2]
    with pytest.raises(ValueError):
        asm.assemble_file()


def test_stats_accumulate():
    data = bytes(range(100))
    reg = AssemblyRegistry()
    for f in _mk_frames("s.bin", data, 2):
        reg.offer(f)
    stats = reg.get_stats()
    assert stats["total_files"] == 1
    assert stats["total_bytes"] == len(data)
    assert stats["quality_samples"] == 2
    assert 0 <= stats["average_quality"] <= 1
    reg.clear_stats()
    assert reg.get_stats()["total_files"] == 0


def test_checkpoint_resume(tmp_path):
    data = bytes(range(256)) * 4
    frames = _mk_frames("resume.bin", data, 3)
    reg = AssemblyRegistry()
    reg.offer(frames[0])
    reg.offer(frames[2])
    ckpt = str(tmp_path / "assemblies.json")
    reg.save_state(ckpt)

    # "Restart": fresh registry resumes and completes with the missing part.
    reg2 = AssemblyRegistry()
    assert reg2.load_state(ckpt) == 1
    assert reg2.get_status()[0]["received"] == 2
    assert reg2.offer(frames[1]) == data


def test_checkpoint_drops_expired(tmp_path):
    reg = AssemblyRegistry(timeout_seconds=0)
    reg.offer(_mk_frames("old.bin", b"x" * 50, 2)[0])
    ckpt = str(tmp_path / "a.json")
    reg.save_state(ckpt)
    time.sleep(0.01)
    reg2 = AssemblyRegistry(timeout_seconds=0)
    assert reg2.load_state(ckpt) == 0


def test_load_missing_checkpoint():
    assert AssemblyRegistry().load_state("/nonexistent/path.json") == 0
