"""Harnesses (Phase F/G/I analogs), core utils, RT registry."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from lsr_tpu.core.util import FrameClock, Result, log_info, log_warn
from lsr_tpu.gfx.rt_registry import RTRegistry
from lsr_tpu.utils.harness import (
    SoakAcceptance,
    ldr_hash,
    run_backend_parity,
    run_benchmark,
    run_soak,
)


def test_result():
    ok = Result.success(5)
    assert ok.ok and ok.unwrap() == 5
    bad = Result.failure("nope")
    assert not bad.ok
    with pytest.raises(RuntimeError):
        bad.unwrap()


def test_frame_clock():
    t = [0.0]

    def fake_now():
        return t[0]

    clk = FrameClock(now_fn=fake_now)
    t[0] = 0.1
    assert abs(clk.tick() - 0.1) < 1e-9
    t[0] = 0.3
    clk.tick()
    assert clk.frame == 2
    assert abs(clk.fps() - 2 / 0.3) < 1e-6


def test_rt_registry_rebuild_counting():
    rtr = RTRegistry(64, 64)
    a = rtr.ensure_transient("hdr", "color_hdr")
    assert a.shape == (64, 64, 3)
    b = rtr.ensure_transient("hdr", "color_hdr")
    assert b is a  # cached, no rebuild
    assert rtr.rebuild_count == 0
    rtr.ensure_transient("hdr", "color_hdr", 32, 32)  # size change
    assert rtr.rebuild_count == 1
    rtr.resize(128, 128)
    assert rtr.rebuild_count == 2
    assert not rtr.valid("hdr")
    d = rtr.ensure_transient("depth", "depth")
    assert d.shape == (128, 128) and float(d[0, 0]) == 1.0


def test_ldr_hash_sensitivity():
    img = np.zeros((8, 8, 3), np.uint8)
    h1 = ldr_hash(img)
    img2 = img.copy()
    img2[3, 3, 1] = 1
    assert ldr_hash(img2) != h1
    assert ldr_hash(img.reshape(4, 16, 3)) != h1  # shape-aware


def test_benchmark_and_parity_and_soak(tmp_path):
    calls = []

    def frame(i):
        calls.append(i)
        return jnp.full((4, 4, 3), (i * 7) % 256, jnp.uint8)

    res = run_benchmark("tiny", frame, warmup=2, samples=5,
                        jsonl_path=str(tmp_path / "f.jsonl"),
                        meta={"lights": 0})
    assert res.frames == 5 and res.ms_avg >= 0.0
    rows = [json.loads(l) for l in open(tmp_path / "f.jsonl")]
    assert rows[0]["composition"] == "tiny" and rows[0]["lights"] == 0

    # Parity: identical functions match; a differing backend is flagged.
    def frame_b(i):
        return jnp.full((4, 4, 3), (i * 7) % 256, jnp.uint8)

    def frame_bad(i):
        return jnp.full((4, 4, 3), (i * 7 + 1) % 256, jnp.uint8)

    out = run_backend_parity(
        {"same": {"a": frame, "b": frame_b},
         "diff": {"a": frame, "b": frame_bad}},
        warmup=1, samples=2, jsonl_path=str(tmp_path / "i.jsonl"),
    )
    assert out["same"]["match"] and not out["diff"]["match"]

    rtr = RTRegistry(8, 8)
    report = run_soak({"a": frame, "b": frame_b}, duration_s=0.2,
                      frames_per_cycle=10,
                      acceptance=SoakAcceptance(max_avg_frame_ms=1000.0),
                      rt_registry=rtr,
                      jsonl_path=str(tmp_path / "g.jsonl"))
    assert report["accepted"] and report["frames"] > 0
    # Per-chunk diagnostic rows: one per drain, with host dispatch share.
    grows = [json.loads(l) for l in open(tmp_path / "g.jsonl")]
    chunks = [r for r in grows if r.get("phase") == "G_chunk"]
    assert len(chunks) == report["drains"]
    assert sum(c["frames"] for c in chunks) == report["frames"]
    for c in chunks:
        assert c["composition"] in ("a", "b")
        assert c["dispatch_ms_per_frame"] >= 0.0


def test_logging_smoke(capsys):
    log_info("hello")
    log_warn("careful")
    cap = capsys.readouterr()
    assert "hello" in cap.out
    assert "careful" in cap.err
