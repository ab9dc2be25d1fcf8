"""Executed multi-PROCESS mesh: collectives cross an OS process boundary.

Everything else in tests/ shards over a single-process virtual mesh; this
test spawns two fresh worker processes (4 virtual CPU devices each) whose
8-device global mesh runs the DP+TP ArcFace train step — gradient psums
cross the process boundary through the distributed runtime (gloo), the
same program shape as DCN crossings between TPU hosts. Asserts:
  * both workers finish and agree on the globally-reduced loss
  * the cross-process loss matches the single-process 8-device run
    (same seeds, same step count) within reduction-order tolerance
"""
import pytest

import json
import os
import socket
import subprocess
import sys

import numpy as np

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(procs, pid, coordinator, out):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    return subprocess.Popen(
        [sys.executable, "-m",
         "face_detection_and_recognition_tpu.parallel.mp_demo",
         "--procs", str(procs), "--pid", str(pid),
         "--coordinator", coordinator, "--out", out],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def test_two_process_mesh_matches_single_process(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    workers = [_spawn(2, i, coordinator, outs[i]) for i in range(2)]
    logs = []
    for w in workers:
        out, _ = w.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(w.returncode == 0 for w in workers), "\n".join(logs)
    results = [json.load(open(p)) for p in outs]

    # both processes hold the same fully-replicated state after the psums
    assert results[0]["n_devices"] == 8
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(results[0]["kernel_sum"],
                               results[1]["kernel_sum"], rtol=1e-6)

    # the cross-process run computes the same step as one process with all
    # 8 devices (the in-test virtual mesh from conftest's XLA_FLAGS)
    from face_detection_and_recognition_tpu.parallel.mesh import make_mesh
    from face_detection_and_recognition_tpu.parallel.sharding import (
        batch_sharding)
    from face_detection_and_recognition_tpu.train.arcface import (
        ArcFaceTrainConfig, create_train_state, sharded_train_step)
    import jax

    mesh = make_mesh(("data", "model"), (4, 2))
    cfg = ArcFaceTrainConfig(num_classes=64, embedding_size=128)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step, (params, batch_stats, opt_state) = sharded_train_step(state, mesh)
    images = jax.device_put(
        np.random.RandomState(0).uniform(-1, 1, (8, 112, 112, 3)).astype(
            np.float32), batch_sharding(mesh, 4))
    labels = jax.device_put(
        np.random.RandomState(1).randint(0, cfg.num_classes, (8,)),
        batch_sharding(mesh, 1))
    loss = None
    for _ in range(2):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, images, labels)
    np.testing.assert_allclose(results[0]["loss"], float(loss),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(
        results[0]["kernel_sum"],
        float(abs(np.asarray(jax.device_get(params["arcface_kernel"]))).sum()),
        rtol=1e-5)


def _spawn_mode(procs, pid, coordinator, out, mode):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    return subprocess.Popen(
        [sys.executable, "-m",
         "face_detection_and_recognition_tpu.parallel.mp_demo",
         "--procs", str(procs), "--pid", str(pid),
         "--coordinator", coordinator, "--out", out, "--mode", mode],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def test_two_process_fused_ensemble_matches_single_process(tmp_path):
    """The serving DCN story EXECUTED: the full fused ensemble (detect ->
    crop -> embed -> age/gender, ONE pjit program) with its batch axis
    spanning two OS processes — XLA collectives cross the process boundary
    exactly as they cross DCN between TPU hosts — produces the same result
    as the single-process 8-device mesh (round-3 VERDICT next #9)."""
    # single-process 8-device reference FIRST: it also warms the
    # persistent compile cache, so the two workers below compile the big
    # fused program from cache in seconds — without this, compile skew on
    # a loaded 1-core host can exceed the distributed runtime's SHUTDOWN
    # barrier deadline (one worker exits while the other still compiles)
    from face_detection_and_recognition_tpu.parallel.mesh import make_mesh
    from face_detection_and_recognition_tpu.parallel.mp_demo import (
        ensemble_inputs, ensemble_summaries, make_ensemble_engine)

    mesh = make_mesh(("data",), (8,))
    engine = make_ensemble_engine()
    local = ensemble_summaries(
        engine.detect_embed_classify_batch(ensemble_inputs(), mesh=mesh))

    coordinator = f"localhost:{_free_port()}"
    outs = [str(tmp_path / f"e{i}.json") for i in range(2)]
    workers = [_spawn_mode(2, i, coordinator, outs[i], "ensemble")
               for i in range(2)]
    logs = []
    for w in workers:
        out, _ = w.communicate(timeout=900)
        logs.append(out.decode(errors="replace"))
    assert all(w.returncode == 0 for w in workers), "\n".join(logs)
    results = [json.load(open(p)) for p in outs]

    # both processes observe the identical (replicated) global summaries
    assert results[0]["n_devices"] == 8
    for key in ("boxes_sum", "valid_count", "crops_sum", "emb_sum",
                "age_sum", "gender_sum"):
        np.testing.assert_allclose(results[0][key], results[1][key],
                                   rtol=1e-6, err_msg=key)

    # and the cross-process ensemble equals the single-process 8-device
    # run of the very same program on the very same frames
    assert local["valid_count"] == results[0]["valid_count"]
    for key in ("boxes_sum", "crops_sum", "emb_sum", "age_sum",
                "gender_sum"):
        np.testing.assert_allclose(results[0][key], local[key],
                                   rtol=1e-4, err_msg=key)
