"""Console-app display parity with the reference GUI (VERDICT r1 L6 gaps):
ASCII mode diagrams, playlist persistence, recorder drain, volume meter
plumbing, streaming flush safety."""

import numpy as np

from audio_modem_radio_tpu.diagrams import (
    ascii_constellation,
    ascii_oscillogram,
    mode_diagram,
)


def test_mode_diagrams_render_for_every_mode():
    from audio_modem_radio_tpu.modem import MODES

    for name in MODES:
        d = mode_diagram(name, 2400)
        assert name in d
        assert "unavailable" not in d, f"{name}: {d}"
        assert len(d.splitlines()) >= 3


def test_hell_diagram_reads_hell():
    d = mode_diagram("HELLSCHREIBER")
    assert "glyph raster" in d


def test_oscillogram_shapes():
    t = np.linspace(0, 1, 960)
    art = ascii_oscillogram(np.sin(2 * np.pi * 5 * t), width=40, height=7)
    lines = art.splitlines()
    assert len(lines) == 7 and all(len(ln) == 40 for ln in lines)
    assert "#" in art
    assert ascii_oscillogram(np.zeros(0)) == "(empty waveform)"


def test_constellation_labels():
    art = ascii_constellation(np.array([[1.0, 0.0], [0.0, 1.0]]), ["00", "01"])
    assert "00" in art and "01" in art and "+" in art


def test_playlist_persists_across_sessions(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from audio_modem_radio_tpu.app import ConsoleApp

    app = ConsoleApp()
    app.playlist = ["x.wav", "y.wav"]
    app._restored_played = {"x.wav"}
    app._save_playlist()

    app2 = ConsoleApp()
    assert app2.playlist == ["x.wav", "y.wav"]
    assert app2._restored_played == {"x.wav"}


def test_recorder_drain_is_continuous():
    """drain() must hand over buffered blocks without stopping the stream
    (the stop()/start() loop loses the audio between the calls)."""
    from audio_modem_radio_tpu.audio_io import Recorder

    rec = Recorder()
    blk = np.ones((100, 1), np.float32)
    rec._callback(blk, 100, None, None)
    first = rec.drain()
    assert len(first) == 100
    rec._callback(blk * 2, 100, None, None)
    second = rec.drain()
    assert len(second) == 100 and second[0] == 2.0
    assert len(rec.drain()) == 0


def test_recorder_volume_callback():
    from audio_modem_radio_tpu.audio_io import Recorder

    rec = Recorder()
    levels = []
    rec.volume_callback = levels.append
    rec._callback(np.full((100, 1), 0.05, np.float32), 100, None, None)
    assert levels and 0.0 < levels[0] <= 1.0


def test_file_recorder_drain_once(tmp_path):
    from audio_modem_radio_tpu.audio_io import FileRecorder
    from audio_modem_radio_tpu.utils.wavio import write_wav

    p = str(tmp_path / "x.wav")
    write_wav(p, np.ones(1000, np.float32) * 0.5, 96000)
    rec = FileRecorder(p)
    assert len(rec.drain()) == 1000
    assert len(rec.drain()) == 0


def test_streaming_flush_never_discards(tmp_path, monkeypatch, rng):
    """flush() after a huge final chunk decodes everything in the buffer."""
    monkeypatch.chdir(tmp_path)
    from audio_modem_radio_tpu.assembly import AssemblyRegistry
    from audio_modem_radio_tpu.framing import crc32, pack_frame
    from audio_modem_radio_tpu.modem import modulate
    from audio_modem_radio_tpu.streaming import StreamingDecoder

    payload = rng.integers(0, 256, 400, dtype=np.uint8).tobytes()
    framed = pack_frame("s.bin", payload, 0, 1, len(payload), crc32(payload))
    wave = np.asarray(modulate("QPSK", framed, 9600), np.float32)

    dec = StreamingDecoder("QPSK", 9600, window=1 << 16, registry=AssemblyRegistry())
    # Bypass feed()'s draining by stuffing the buffer directly, simulating a
    # caller that fed a final chunk much larger than the window.
    big = np.concatenate([np.zeros(1 << 16, np.float32), wave])
    dec._buf = big
    saved = dec.flush()
    assert saved and open(saved[0], "rb").read() == payload


def test_tui_render_functions():
    """The TUI's pure render layer covers every reference GUI affordance
    without needing a terminal."""
    from audio_modem_radio_tpu.tui import (
        AppState,
        render_screen,
        render_volume_bar,
    )

    st = AppState()
    st.playlist = ["a.wav", "b.wav"]
    st.played = {"a.wav"}
    st.playing = "b.wav"
    st.stats = {"total_files": 2}
    st.channel = {"snr_db": 17.5, "recommended": "QPSK"}
    st.assemblies = [{"filename": "big.bin", "received": 2, "total": 3}]
    st.host = {"cpu": 10}
    st.volume = 0.5
    st.recording = True
    st.logline("hello")

    for tab in range(4):
        st.tab = tab
        lines = render_screen(st, width=80)
        assert all(len(ln) <= 80 for ln in lines)
        assert any("QPSK@9600Bd" in ln for ln in lines)
        assert any("hello" in ln for ln in lines)

    st.tab = 2
    st.sel = 1
    txt = "\n".join(render_screen(st, 80))
    assert "* [0] a.wav" in txt  # played
    assert "->> [1] b.wav" in txt  # playing + selection cursor
    st.tab = 1
    txt = "\n".join(render_screen(st, 80))
    assert "level [" in txt and "big.bin 2/3" in txt
    st.tab = 3
    txt = "\n".join(render_screen(st, 80))
    assert "17.5 dB" in txt and "QPSK" in txt

    bar = render_volume_bar(0.5, width=10)
    assert bar.count("#") == 5 and " 50%" in bar


def test_run_exits_on_eof(monkeypatch, tmp_path, capsys):
    """Closed stdin must exit the REPL like 'quit', not busy-loop on the
    empty default (regression: piping empty input spun forever)."""
    monkeypatch.chdir(tmp_path)
    from audio_modem_radio_tpu.app import ConsoleApp

    def eof_input(prompt=""):
        raise EOFError

    monkeypatch.setattr("builtins.input", eof_input)
    ConsoleApp().run()  # returns instead of spinning
