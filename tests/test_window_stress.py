"""App-layer randomized stress: hundreds of random events through the
REAL Tk-shell wiring (fake-Tk double) — keys with random modifiers,
drags, wheel, dialogs, auto-advance ticks — must never raise, and the
final frame must match a COLD scene configured with the same final
state (the app-layer extension of the mesh-interactive stress test:
any stale cache in the session/shell/scene stack shows up as a pixel
diff)."""

from datetime import datetime, timezone

import numpy as np
import pytest

import tests.fake_tk as fake_tk

T0 = datetime(2024, 4, 15, 21, 0, tzinfo=timezone.utc)

KEYS = ["w", "q", "w", "q", "m", "n", "a", "z", "e", "d", "x", "g", "l",
        "s", "p", "h", "j", "r", "v", "Left", "Right", "Up", "Down",
        "F2", "F4", "F5", "F6", "F7", "F8", "c", "1", "3"]


@pytest.fixture(scope="module")
def small_maps():
    from moonrtx_tpu.data.synth import synthesize_moon

    elev, albedo = synthesize_moon(180, 360, seed=9, n_craters=40)
    rs = float(elev.max())
    return (elev / rs).astype(np.float32), rs, albedo


def _make_scene(small_maps):
    from moonrtx_tpu.config import RenderConfig
    from moonrtx_tpu.engine.scene import MoonScene
    from moonrtx_tpu.types import Observer

    elev, rs, albedo = small_maps
    cfg = RenderConfig(
        observer=Observer(50.06, 19.94, 219), dt_local=T0,
        width=96, height=96, shadow_accuracy=2,
        accumulation_frames=2, time_step_minutes=15,
    ).validate()
    return MoonScene(cfg, elev, rs, albedo, None)


def test_window_random_event_storm(monkeypatch, small_maps):
    import moonrtx_tpu.app.window as window_mod
    from moonrtx_tpu.app.session import Session

    fake_tk.install(monkeypatch)
    scene = _make_scene(small_maps)
    scene.features = []
    captured = {}

    def capture_session(scn, features):
        s = Session(scn, features)
        captured["s"] = s
        return s

    monkeypatch.setattr(window_mod, "build_scene",
                        lambda config, with_starmap=True: scene)
    monkeypatch.setattr(window_mod, "Session", capture_session)
    import PIL.ImageTk

    monkeypatch.setattr(PIL.ImageTk, "PhotoImage", lambda img: img)
    window_mod.run_window(scene.config)
    root = fake_tk.roots[-1]
    canvas = next(w for w in fake_tk.descendants(root)
                  if isinstance(w, fake_tk.Canvas))
    sess = captured["s"]

    rng = np.random.default_rng(77)
    for i in range(220):
        ev = rng.integers(0, 8)
        x = int(rng.integers(0, 96))
        y = int(rng.integers(0, 96))
        if ev <= 3:   # keys dominate (with random modifiers)
            key = KEYS[rng.integers(0, len(KEYS))]
            state = int(rng.choice([0, 0, 0x1, 0x4]))
            root.fire("<Key>", fake_tk.Event(keysym=key, state=state,
                                             x=x, y=y))
        elif ev == 4:  # left drag (orbit / ctrl-measure / shift-zoom)
            state = int(rng.choice([0, 0, 0x1, 0x4]))
            canvas.fire("<ButtonPress-1>",
                        fake_tk.Event(x=x, y=y, state=state))
            canvas.fire("<B1-Motion>",
                        fake_tk.Event(x=x + 2, y=y + 1, state=state))
            canvas.fire("<ButtonRelease-1>",
                        fake_tk.Event(x=x + 2, y=y + 1, state=state))
        elif ev == 5:  # right drag (pan / shift-dolly)
            state = int(rng.choice([0, 0x1]))
            canvas.fire("<ButtonPress-3>",
                        fake_tk.Event(x=x, y=y, state=state))
            canvas.fire("<B3-Motion>",
                        fake_tk.Event(x=x - 1, y=y + 2, state=state))
        elif ev == 6:  # wheel + hover picking
            canvas.fire("<MouseWheel>",
                        fake_tk.Event(delta=int(rng.choice([-120, 120]))))
            canvas.fire("<Motion>", fake_tk.Event(x=x, y=y))
        else:          # timers + a datetime-dialog round trip
            root.run_pending_after()
            if rng.random() < 0.3:
                root.fire("<Key>", fake_tk.Event(keysym="t"))
                dlg = fake_tk.toplevels[-1]
                sets = fake_tk.find_buttons(dlg, "Set")
                if sets:
                    sets[0].invoke()
                dlg.destroy()
        if i % 37 == 36:
            sess.frame()   # render mid-storm so caches engage

    # deterministic final frame: sample 0 uses the centered jitter, so a
    # 1-sample accumulation is RNG-stream-independent and comparable
    sess.scene.reset_accumulation()
    img = sess.frame(n_accum=1).copy()
    s = sess.scene

    # parity: a cold scene at the exact final state renders the same
    cold = _make_scene(small_maps)
    cold.view_orientation = s.view_orientation
    cold.parallactic_mode = s.parallactic_mode
    cold.brightness = s.brightness
    cold.gamma = s.gamma
    cold.camera = s.camera
    cold.shadows_on = s.shadows_on
    cold.indirect_light = s.indirect_light
    cold.update_view(s.dt_local)
    cold_sess = Session(cold, [])
    cold_sess.grid_visible = sess.grid_visible
    cold_sess._grid_graphs = sess._grid_graphs
    cold_sess.standard_labels_visible = sess.standard_labels_visible
    cold_sess._standard_graph = sess._standard_graph
    cold_sess.spot_labels_visible = sess.spot_labels_visible
    cold_sess._spot_graph = sess._spot_graph
    cold_sess.pins_visible = sess.pins_visible
    cold_sess.pins = sess.pins
    img_cold = cold_sess.frame(n_accum=1).copy()
    d = np.abs(img.astype(np.float32) - img_cold.astype(np.float32))
    assert d.max() <= 1.0, (d.max(), (d > 1).mean())
