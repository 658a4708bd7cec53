"""Interactive keyboard play (reference: procgen/interactive.py).

``python -m procgen_tpu.interactive --env-name maze --distribution-mode easy``

Renders the 64x64 observation as half-block ANSI color in the terminal via
curses at ~15 Hz (the reference viewer's tps, gym_registration.py:24).
Controls: arrows/WASD move, q/e and digit keys map to the special actions,
Shift+F1 (key '!') saves state, F1 (key '1') restores it — mirroring the
reference's save/load bindings (interactive.py:11-25).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from .env import ProcgenGym3Env


class EpisodeRecorder:
    """Per-episode video recording (reference: interactive.py:28-49 wires
    gym3.VideoRecorderWrapper when --record-dir is given).

    Writes one artifact per finished episode into ``directory``:
    ``episode_{k:05d}.npz`` with the uint8 frame stack [T,H,W,3], plus an
    animated ``episode_{k:05d}.gif`` when pillow is importable (the
    container has no ffmpeg, so mp4 is not an option here).
    """

    def __init__(self, directory: str, fps: int = 15):
        self.directory = directory
        self.fps = fps
        self.frames: list[np.ndarray] = []
        self.episode = 0
        os.makedirs(directory, exist_ok=True)

    def append(self, frame: np.ndarray) -> None:
        self.frames.append(np.asarray(frame, np.uint8))

    def flush(self) -> None:
        if not self.frames:
            return
        stack = np.stack(self.frames)
        base = os.path.join(self.directory, f"episode_{self.episode:05d}")
        np.savez_compressed(base + ".npz", frames=stack, fps=self.fps)
        try:
            from PIL import Image

            imgs = [Image.fromarray(f) for f in stack]
            imgs[0].save(
                base + ".gif",
                save_all=True,
                append_images=imgs[1:],
                duration=int(1000 / self.fps),
                loop=0,
            )
        except ImportError:
            pass
        self.frames = []
        self.episode += 1


KEY_TO_COMBO = {
    "LEFT": ("LEFT",),
    "RIGHT": ("RIGHT",),
    "UP": ("UP",),
    "DOWN": ("DOWN",),
    "d": ("D",),
    "a": ("A",),
    "w": ("W",),
    "s": ("S",),
    "q": ("Q",),
    "e": ("E",),
}


def _frame_to_ansi(rgb: np.ndarray) -> str:
    """64x64 RGB -> 32 rows of double-resolution half blocks."""
    rows = []
    for y in range(0, rgb.shape[0], 2):
        row = []
        for x in range(rgb.shape[1]):
            top = rgb[y, x]
            bot = rgb[min(y + 1, rgb.shape[0] - 1), x]
            row.append(
                f"\x1b[38;2;{top[0]};{top[1]};{top[2]}m"
                f"\x1b[48;2;{bot[0]};{bot[1]};{bot[2]}m▀"
            )
        rows.append("".join(row) + "\x1b[0m")
    return "\n".join(rows)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--vision", default="agent", choices=["agent", "human"])
    parser.add_argument("--env-name", default="maze")
    parser.add_argument("--distribution-mode", default="hard")
    parser.add_argument("--level-seed", type=int, default=None)
    parser.add_argument("--num-levels", type=int, default=0)
    parser.add_argument("--start-level", type=int, default=0)
    parser.add_argument("--use-monochrome-assets", action="store_true")
    parser.add_argument("--paint-vel-info", action="store_true")
    parser.add_argument("--use-sequential-levels", action="store_true")
    parser.add_argument("--steps", type=int, default=0, help="0 = run until quit")
    parser.add_argument(
        "--record-dir",
        default=None,
        help="directory to record episode videos to "
        "(reference: interactive.py:28-49)",
    )
    args = parser.parse_args(argv)

    kwargs = {
        "num": 1,
        "env_name": args.env_name,
        "distribution_mode": args.distribution_mode,
        "use_monochrome_assets": args.use_monochrome_assets,
        "paint_vel_info": args.paint_vel_info,
        "use_sequential_levels": args.use_sequential_levels,
    }
    if args.level_seed is not None:
        kwargs["num_levels"] = 1
        kwargs["start_level"] = args.level_seed
    else:
        kwargs["num_levels"] = args.num_levels
        kwargs["start_level"] = args.start_level

    env = ProcgenGym3Env(**kwargs)
    recorder = (
        EpisodeRecorder(args.record_dir) if args.record_dir is not None else None
    )

    import curses

    def run(stdscr):
        curses.curs_set(0)
        stdscr.nodelay(True)
        episode_return = 0.0
        saved_state = None
        t = 0
        while args.steps == 0 or t < args.steps:
            keys = []
            while True:
                ch = stdscr.getch()
                if ch == -1:
                    break
                if ch in (ord("x"), 27):
                    return
                if ch == curses.KEY_LEFT:
                    keys.append("LEFT")
                elif ch == curses.KEY_RIGHT:
                    keys.append("RIGHT")
                elif ch == curses.KEY_UP:
                    keys.append("UP")
                elif ch == curses.KEY_DOWN:
                    keys.append("DOWN")
                elif ch == ord("!"):
                    saved_state = env.get_state()
                elif ch == ord("1") and saved_state is not None:
                    env.set_state(saved_state)
                elif 0 <= ch < 256:
                    c = chr(ch)
                    if c in KEY_TO_COMBO:
                        keys.append(KEY_TO_COMBO[c][0])

            acts = env.keys_to_act([keys])
            act = acts[0] if acts[0] is not None else np.array([4])
            env.act(act)
            rew, obs, first = env.observe()
            episode_return = float(rew[0]) + (0.0 if first[0] else episode_return)

            if recorder is not None:
                if first[0]:
                    recorder.flush()
                recorder.append(np.asarray(obs["rgb"][0]))

            frame = _frame_to_ansi(obs["rgb"][0])
            stdscr.erase()
            try:
                stdscr.addstr(0, 0, f"step {t}  return {episode_return:+.2f}  [x quits]")
                for li, line in enumerate(frame.split("\n")):
                    stdscr.addstr(li + 1, 0, "")  # position only
            except curses.error:
                pass
            stdscr.refresh()
            # true-color frame printed directly (curses lacks 24-bit color)
            print("\x1b[2;0H" + frame, end="", flush=True)
            t += 1
            time.sleep(1 / 15)  # 15 Hz, README.md:105

    try:
        curses.wrapper(run)
    finally:
        if recorder is not None:
            recorder.flush()


if __name__ == "__main__":
    main()
