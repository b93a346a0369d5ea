"""Input reducers / FSM / commands / ECS world — the VOP logic layer.

Mirrors the reference's reducer tests (vop_core_tests.cpp:150-199, :237)."""

import math

from lsr_tpu.app.runtime_state import CameraRig, RuntimeState
from lsr_tpu.input.value_actions import (
    InputLatch,
    QUIT,
    RuntimeAction,
    clear_frame_deltas,
    emit_human_actions,
    emit_orbit_bot_actions,
    make_look_action,
    make_move_local_action,
    reduce_input_latch,
    reduce_runtime_state,
)
from lsr_tpu.logic.state_machine import (
    Command,
    StateCallbacks,
    StateMachine,
    reduce_all,
)
from lsr_tpu.scene.world import SystemProcessor, World


def test_move_reducer_uses_camera_basis():
    s = RuntimeState(camera=CameraRig(pos=(0, 0, 0), yaw=0.0))
    s2 = reduce_runtime_state(s, [make_move_local_action((0, 0, 1), 2.0)], 0.5)
    assert s2.camera.pos == (0.0, 0.0, 1.0)  # forward +Z, 2 m/s * 0.5 s
    # Original state untouched (value semantics).
    assert s.camera.pos == (0, 0, 0)

    # After yawing 90deg, forward is +X.
    s3 = RuntimeState(camera=CameraRig(pos=(0, 0, 0), yaw=math.pi / 2))
    s4 = reduce_runtime_state(s3, [make_move_local_action((0, 0, 1), 1.0)], 1.0)
    assert abs(s4.camera.pos[0] - 1.0) < 1e-6
    assert abs(s4.camera.pos[2]) < 1e-6


def test_look_reducer_clamps_pitch():
    s = RuntimeState()
    s2 = reduce_runtime_state(s, [make_look_action(0.0, -10000.0, 1.0)], 1.0)
    assert abs(s2.camera.pitch - math.radians(85.0)) < 1e-6
    s3 = reduce_runtime_state(s, [make_look_action(0.0, 10000.0, 1.0)], 1.0)
    assert abs(s3.camera.pitch + math.radians(85.0)) < 1e-6


def test_toggles_and_quit_latch():
    s = RuntimeState()
    s = reduce_runtime_state(s, [RuntimeAction("toggle_light_shafts"),
                                 RuntimeAction("toggle_bot"),
                                 RuntimeAction(QUIT)], 1.0)
    assert not s.enable_light_shafts and s.bot_enabled and s.quit_requested
    s = reduce_runtime_state(s, [RuntimeAction("toggle_light_shafts")], 1.0)
    assert s.enable_light_shafts
    assert s.quit_requested  # quit stays latched


def test_input_latch_accumulates_mouse():
    latch = InputLatch()
    latch = reduce_input_latch(latch, [
        ("set_forward", True), ("set_boost", True),
        ("add_mouse_delta", (2.0, 1.0)), ("add_mouse_delta", (3.0, -0.5)),
        ("set_left_mouse_down", True),
    ])
    assert latch.forward and latch.boost and latch.left_mouse_down
    assert latch.mouse_dx_accum == 5.0 and latch.mouse_dy_accum == 0.5

    actions = emit_human_actions(latch, base_speed=2.0, boost_multiplier=3.0,
                                 look_sensitivity=0.01)
    # forward move at boosted speed + a look action.
    assert actions[0].meters_per_sec == 6.0
    assert any(a.type == "look" for a in actions)

    latch = clear_frame_deltas(latch)
    assert latch.mouse_dx_accum == 0.0
    assert latch.forward  # keys stay latched across frames


def test_bot_emitter_moves_camera():
    s = RuntimeState(bot_enabled=True)
    for t in range(20):
        s = reduce_runtime_state(s, emit_orbit_bot_actions(t * 0.1), 0.1)
    assert s.camera.pos != (0.0, 0.0, -5.0)
    assert s.camera.yaw != 0.0


def test_state_machine_priority_and_hooks():
    trace = []
    fsm = StateMachine()
    fsm.add_state("idle", StateCallbacks(
        on_enter=lambda c: trace.append("enter:idle"),
        on_exit=lambda c: trace.append("exit:idle")))
    fsm.add_state("walk", StateCallbacks(
        on_enter=lambda c: trace.append("enter:walk")))
    fsm.add_state("run", StateCallbacks(
        on_enter=lambda c: trace.append("enter:run")))
    assert not fsm.add_state("idle")  # duplicate rejected

    # Two candidate transitions; higher priority (run) must win.
    fsm.add_transition("idle", "walk", lambda c, e: e >= 1.0, priority=0)
    fsm.add_transition("idle", "run", lambda c, e: e >= 1.0, priority=5)
    fsm.start("idle")
    fsm.update(None, 0.5)
    assert fsm.current == "idle"
    fsm.update(None, 0.6)
    assert fsm.current == "run"
    assert trace == ["enter:idle", "exit:idle", "enter:run"]
    assert fsm.elapsed == 0.0


def test_command_reduce_all():
    class Add(Command):
        def __init__(self, n):
            self.n = n

        def apply(self, state):
            return state + self.n

    assert reduce_all(10, [Add(1), Add(2), Add(3)]) == 16


def test_world_ecs():
    w = World()
    a = w.create_entity()
    b = w.create_entity()
    w.add_component(a, "pos", (1, 2, 3))
    w.add_component(a, "vel", (1, 0, 0))
    w.add_component(b, "pos", (0, 0, 0))

    both = list(w.entities_with("pos", "vel"))
    assert both == [(a, (1, 2, 3), (1, 0, 0))]

    def integrate(world, dt):
        for eid, pos, vel in list(world.entities_with("pos", "vel")):
            world.add_component(eid, "pos",
                                tuple(p + v * dt for p, v in zip(pos, vel)))

    sp = SystemProcessor().register(integrate)
    sp.process(w, 2.0)
    assert w.get_component(a, "pos") == (3, 2, 3)

    w.destroy_entity(a)
    assert not w.is_alive(a)
    assert w.count("pos") == 1
