#!/usr/bin/env python
"""Interactive warehouse play in the terminal.

Equivalent of the reference's pyglet-based ``human_play.py`` (argparse
surface: --env/--max_steps/--display_info; TAB cycles the controlled agent,
arrows/WASD move, SPACE toggles load, R resets) rendered as a curses TUI so
it works over SSH and in containers with no display.

Keys: arrows/WASD = rotate-or-forward, SPACE = toggle load, TAB = next agent,
R = reset, Q = quit.  The controlled agent acts; all others NOOP.
"""
from __future__ import annotations

import argparse
import curses

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", default="rware-tiny-2ag-v2")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument(
        "--display_info", action="store_true", help="show rewards/info each step"
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--backend", choices=["auto", "curses", "window"], default="auto",
        help="window = graphical viewer with key hooks (needs a display, "
        "the reference's pyglet-window equivalent); curses = terminal TUI; "
        "auto tries window, falls back to curses",
    )
    return p.parse_args()


DIR_GLYPH = {0: "^", 1: "v", 2: "<", 3: ">"}


def draw(stdscr, env, state, selected, msg, display_info, last):
    import rware_tpu

    stdscr.erase()
    h, w = env.grid_size
    highways = env._env.layout.highways
    goals = {tuple(g) for g in env._env.layout.goals.tolist()}
    sx = np.asarray(state.shelf_x)
    sy = np.asarray(state.shelf_y)
    req = set(np.asarray(state.request_queue).tolist())
    ax = np.asarray(state.agent_x)
    ay = np.asarray(state.agent_y)
    adir = np.asarray(state.agent_dir)
    carrying = np.asarray(state.agent_carrying)

    shelf_at = {(int(x), int(y)): j for j, (x, y) in enumerate(zip(sx, sy))}
    agent_at = {(int(x), int(y)): i for i, (x, y) in enumerate(zip(ax, ay))}

    for y in range(h):
        row = []
        for x in range(w):
            cell = (x, y)
            if cell in agent_at:
                i = agent_at[cell]
                ch = DIR_GLYPH[int(adir[i])]
                if i == selected:
                    ch = ch.upper() if ch.isalpha() else ch
                row.append(
                    f"[{ch}]" if carrying[i] >= 0 else f"({ch})"
                    if i == selected
                    else f" {ch}{'#' if carrying[i] >= 0 else ' '}"
                )
            elif cell in shelf_at:
                j = shelf_at[cell]
                row.append(" ▣ " if j in req else " □ ")
            elif cell in goals:
                row.append(" G ")
            elif highways[y, x]:
                row.append(" . ")
            else:
                row.append("   ")
        stdscr.addstr(y, 0, "".join(row))

    stdscr.addstr(h + 1, 0, f"agent {selected} selected | TAB switch, arrows/WASD move, SPACE toggle, R reset, Q quit")
    if msg:
        stdscr.addstr(h + 2, 0, msg[: curses.COLS - 1])
    if display_info and last is not None:
        rew, done, info = last
        stdscr.addstr(h + 3, 0, f"rewards={rew} done={done} info={info}"[: curses.COLS - 1])
    stdscr.refresh()


def main(stdscr, args):
    import os

    import jax

    # Interactive play needs snappy steps, not accelerator throughput; allow
    # forcing the platform (the container's TPU tunnel adds latency).
    if os.environ.get("RWARE_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RWARE_TPU_PLATFORM"])
    import jax.numpy as jnp
    import rware_tpu
    from rware_tpu.gym_adapter import make_gym
    from rware_tpu.types import Action, Direction

    curses.curs_set(0)
    stdscr.nodelay(False)

    env = make_gym(args.env, max_steps=args.max_steps or 500, render_mode="rgb_array")
    env.reset(seed=args.seed)
    selected = 0
    steps = 0
    last = None
    msg = f"{args.env}: {env.n_agents} agents, grid {env.grid_size}"

    # A key either rotates the selected agent toward the wanted direction or,
    # if already facing it, moves forward — friendlier than raw L/R keys.
    KEYMAP = {
        curses.KEY_UP: Direction.UP, ord("w"): Direction.UP,
        curses.KEY_DOWN: Direction.DOWN, ord("s"): Direction.DOWN,
        curses.KEY_LEFT: Direction.LEFT, ord("a"): Direction.LEFT,
        curses.KEY_RIGHT: Direction.RIGHT, ord("d"): Direction.RIGHT,
    }
    # rotation order UP -> RIGHT -> DOWN -> LEFT (clockwise)
    CLOCK = {0: 3, 3: 1, 1: 2, 2: 0}

    while True:
        draw(stdscr, env, env.state, selected, msg, args.display_info, last)
        key = stdscr.getch()
        action = None
        if key in (ord("q"), ord("Q")):
            break
        elif key == ord("\t"):
            selected = (selected + 1) % env.n_agents
            continue
        elif key in (ord("r"), ord("R")):
            env.reset(seed=args.seed + steps)
            last = None
            continue
        elif key == ord(" "):
            action = int(Action.TOGGLE_LOAD)
        elif key in KEYMAP:
            want = int(KEYMAP[key])
            cur = int(np.asarray(env.state.agent_dir)[selected])
            if cur == want:
                action = int(Action.FORWARD)
            elif CLOCK[cur] == want:
                action = int(Action.RIGHT)
            else:
                action = int(Action.LEFT)
        if action is None:
            continue
        acts = [0] * env.n_agents
        acts[selected] = action
        obs, rew, done, trunc, info = env.step(acts)
        last = (rew, done, info)
        steps += 1
        if done:
            msg = f"episode done after {steps} steps — R to reset"


def main_window(args) -> bool:
    """Windowed play via rendering.InteractiveViewer (the reference's
    pyglet-window surface, rware/rendering.py:85-137 + human_play.py:70).

    Returns False when no GUI backend exists so the caller can fall back.
    """
    import os

    import jax

    if os.environ.get("RWARE_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RWARE_TPU_PLATFORM"])
    import time

    import numpy as np

    from rware_tpu.gym_adapter import make_gym
    from rware_tpu.rendering import InteractiveViewer
    from rware_tpu.types import Action, Direction

    env = make_gym(
        args.env, max_steps=args.max_steps or 500, render_mode="rgb_array"
    )
    try:
        viewer = InteractiveViewer(env.config)
    except RuntimeError as e:
        print(f"windowed viewer unavailable ({e})")
        return False
    env.reset(seed=args.seed)
    state = {"selected": 0, "steps": 0}

    KEYMAP = {
        "up": Direction.UP, "w": Direction.UP,
        "down": Direction.DOWN, "s": Direction.DOWN,
        "left": Direction.LEFT, "a": Direction.LEFT,
        "right": Direction.RIGHT, "d": Direction.RIGHT,
    }
    CLOCK = {0: 3, 3: 1, 1: 2, 2: 0}

    def on_key(key):
        action = None
        if key in ("q", "escape"):
            viewer.close()
            return
        if key == "tab":
            state["selected"] = (state["selected"] + 1) % env.n_agents
            return
        if key == "r":
            env.reset(seed=args.seed + state["steps"])
            viewer.show(env.state)
            return
        if key == " ":
            action = int(Action.TOGGLE_LOAD)
        elif key in KEYMAP:
            want = int(KEYMAP[key])
            cur = int(np.asarray(env.state.agent_dir)[state["selected"]])
            if cur == want:
                action = int(Action.FORWARD)
            elif CLOCK[cur] == want:
                action = int(Action.RIGHT)
            else:
                action = int(Action.LEFT)
        if action is None:
            return
        acts = [0] * env.n_agents
        acts[state["selected"]] = action
        obs, rew, done, trunc, info = env.step(acts)
        state["steps"] += 1
        if args.display_info:
            print(f"rewards={rew} done={done} info={info}")
        viewer.show(env.state)

    viewer.on_key_press = on_key
    viewer.show(env.state)
    print(
        f"{args.env}: arrows/WASD move, SPACE toggle, TAB agent, R reset, "
        "Q quit (focus the window)"
    )
    while viewer.open:
        viewer._fig.canvas.flush_events()
        time.sleep(0.03)
    return True


if __name__ == "__main__":
    args = parse_args()
    if args.backend in ("auto", "window"):
        if main_window(args):
            raise SystemExit(0)
        if args.backend == "window":
            raise SystemExit(1)
    curses.wrapper(main, args)
