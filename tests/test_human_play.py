"""Key-binding parity for the interactive CLI: the default 'reference'
map must match the reference human_play.py _key_press table
(/root/reference/human_play.py:114-147)."""
import sys

sys.path.insert(0, "/root/repo")

from human_play import HELP_FRIENDLY, HELP_REFERENCE, dispatch_key
from rware_tpu.types import Action


def test_reference_bindings_match_reference_table():
    # the reference's map: UP=forward, LEFT/RIGHT=rotate, P/L=load,
    # SPACE=noop, TAB=cycle, R=reset, H=help, D=toggle info, ESC=quit
    assert dispatch_key("reference", "up", 0) == (
        "action", int(Action.FORWARD))
    assert dispatch_key("reference", "left", 0) == (
        "action", int(Action.LEFT))
    assert dispatch_key("reference", "right", 0) == (
        "action", int(Action.RIGHT))
    for k in ("p", "l"):
        assert dispatch_key("reference", k, 0) == (
            "action", int(Action.TOGGLE_LOAD))
    assert dispatch_key("reference", " ", 0) == ("action", int(Action.NOOP))
    assert dispatch_key("reference", "tab", 0) == ("cycle",)
    assert dispatch_key("reference", "r", 0) == ("reset",)
    assert dispatch_key("reference", "h", 0) == ("help",)
    assert dispatch_key("reference", "d", 0) == ("toggle_info",)
    assert dispatch_key("reference", "escape", 0) == ("quit",)
    # unmapped keys are ignored (the reference warns; we no-op)
    assert dispatch_key("reference", "w", 0) is None


def test_friendly_bindings_preserved():
    # facing UP (0): 'up' moves forward, 'right' rotates clockwise
    assert dispatch_key("friendly", "up", 0) == (
        "action", int(Action.FORWARD))
    assert dispatch_key("friendly", "right", 0) == (
        "action", int(Action.RIGHT))
    assert dispatch_key("friendly", " ", 0) == (
        "action", int(Action.TOGGLE_LOAD))
    assert dispatch_key("friendly", "q", 0) == ("quit",)
    assert HELP_REFERENCE != HELP_FRIENDLY
