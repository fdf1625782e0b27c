"""Preview backend tests, headless.

PygameWindow runs under SDL's dummy video driver so the event/resize/
aspect-fit paths (the reference's swapchain-blit behavior,
reference: src/vulkan/command.rs:97-141 and the winit event loop in
src/main.rs:186-219) are covered without a display server.
"""

import os

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")


@pytest.fixture()
def dummy_sdl(monkeypatch):
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    yield
    if pygame.display.get_init():
        pygame.display.quit()


def make_window(w=64, h=48):
    from reforge_tpu.window import PygameWindow

    return PygameWindow(w, h)


def frame(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 4), np.uint8)


class TestPygameWindow:
    def test_show_and_close(self, dummy_sdl):
        win = make_window()
        assert win.interactive
        win.show(frame())
        assert win.target_px() == 64  # max(screen w, h)
        win.close()
        assert not pygame.display.get_init()

    def test_show_aspect_fit_scales(self, dummy_sdl):
        # A frame with a different aspect than the window exercises the
        # smoothscale + centered-blit path (command.rs:111-123 analog).
        win = make_window(64, 48)
        win.show(frame(h=100, w=30))
        win.show(frame(h=10, w=300))
        win.close()

    def test_poll_quit_on_quit_event(self, dummy_sdl):
        win = make_window()
        assert win.poll_quit() is False
        pygame.event.post(pygame.event.Event(pygame.QUIT))
        assert win.poll_quit() is True
        win.close()

    def test_poll_quit_on_escape(self, dummy_sdl):
        win = make_window()
        pygame.event.post(
            pygame.event.Event(pygame.KEYDOWN, key=pygame.K_ESCAPE)
        )
        assert win.poll_quit() is True
        # Non-escape keys don't quit.
        pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_a))
        assert win.poll_quit() is False
        win.close()

    def test_poll_resize_roundtrip(self, dummy_sdl):
        win = make_window()
        assert win.poll_resize() is None
        pygame.event.post(
            pygame.event.Event(pygame.VIDEORESIZE, w=128, h=96)
        )
        assert win.poll_quit() is False  # resize is not a quit
        assert win.poll_resize() == (128, 96)
        assert win.poll_resize() is None  # consumed
        win.close()


class TestCliLiveLoopWindowed:
    def test_live_loop_three_frames(self, dummy_sdl, tmp_path, monkeypatch):
        # Full CLI live loop with the pygame backend: render --frames 3,
        # exercising show() + poll_quit() + poll_resize() per frame and
        # the device-side preview downsampling (read_output_scaled).
        from reforge_tpu.cli import main
        from reforge_tpu.io import encode

        rgba = frame(h=32, w=40, seed=3)
        rgba[..., 3] = 255
        inp = str(tmp_path / "in.png")
        encode(inp, rgba)
        rc = main(["-i", inp, "--preview", "window", "--frames", "3"])
        assert rc == 0
        assert not pygame.display.get_init()  # loop closed the window


class TestKittyPreview:
    def test_show_emits_kitty_protocol(self, capsys):
        from reforge_tpu.window import KittyPreview

        kp = KittyPreview(max_cols_px=64)
        assert kp.target_px() == 64
        kp.show(frame(h=8, w=10))
        out = capsys.readouterr().out
        # APC introducer with transmit+display, zlib payload, final chunk.
        assert "\x1b_Ga=T,f=32,s=10,v=8,o=z" in out
        assert out.rstrip().endswith("\x1b\\")
        # Second frame overdraws in place (cursor home).
        kp.show(frame(h=8, w=10))
        assert "\x1b[H" in capsys.readouterr().out

    def test_oversized_frame_strided_fallback(self, capsys):
        from reforge_tpu.window import KittyPreview

        kp = KittyPreview(max_cols_px=16)
        kp.show(frame(h=12, w=40))  # direct caller, wider than max
        out = capsys.readouterr().out
        # 40 -> ceil(40/16)=3 stride -> 14 cols
        assert "s=14" in out


class TestCliProfileFlag:
    def test_profile_writes_trace(self, tmp_path):
        from reforge_tpu.cli import main
        from reforge_tpu.io import encode

        rgba = frame(h=16, w=20, seed=4)
        rgba[..., 3] = 255
        inp = str(tmp_path / "in.png")
        outp = str(tmp_path / "out.png")
        encode(inp, rgba)
        tdir = tmp_path / "trace"
        rc = main(["-i", inp, "-o", outp, "--profile", str(tdir)])
        assert rc == 0
        import glob

        assert glob.glob(str(tdir / "**" / "*.json.gz"), recursive=True) or \
            glob.glob(str(tdir / "**" / "*.xplane.pb"), recursive=True), \
            "no profiler artifact written"
