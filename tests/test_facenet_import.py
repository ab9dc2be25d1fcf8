"""Keras FaceNet weights path: TensorBundle reader + h5/SavedModel import.

The reference's similar-face filter loads a keras FaceNet SavedModel
(``similar_face_filtering/filter_faces_using_reference.py:131``). Real
weights are not downloadable here, so these tests prove the full mechanism
on synthetic twins: (a) the vendor-free TensorBundle reader round-trips and
cross-validates against real TensorFlow in BOTH directions when tf is
importable, (b) a fixture SavedModel/h5 written from one random FaceNet
pours into a fresh net and reproduces its embeddings exactly.
"""
import os

import numpy as np
import pytest

from face_detection_and_recognition_tpu.utils.tensor_bundle import (

    read_tensor_bundle, write_tensor_bundle)

pytestmark = pytest.mark.parity  # parity lane (pyproject addopts)


def test_tensor_bundle_roundtrip(tmp_path, rng):
    prefix = str(tmp_path / "variables" / "variables")
    tensors = [
        ("a/kernel", rng.randn(3, 3, 4, 8).astype(np.float32)),
        ("a/bias", rng.randn(8).astype(np.float32)),
        ("z/step", np.asarray(7, np.int64).reshape(())),
        ("m/int32", np.arange(6, dtype=np.int32).reshape(2, 3)),
    ]
    write_tensor_bundle(prefix, tensors)
    back = dict(read_tensor_bundle(prefix))
    assert set(back) == {n for n, _ in tensors}
    for name, arr in tensors:
        assert back[name].shape == arr.shape
        assert back[name].dtype == arr.dtype
        np.testing.assert_array_equal(back[name], arr)


def test_tensor_bundle_tf_cross_validation(tmp_path, rng):
    """Real TensorFlow reads OUR bundles and we read TF's checkpoints —
    the format implementation is validated against the vendor, not itself."""
    tf = pytest.importorskip("tensorflow")

    prefix = str(tmp_path / "ours" / "variables")
    kern = rng.randn(5, 7).astype(np.float32)
    write_tensor_bundle(prefix, [("w", kern)])
    reader = tf.train.load_checkpoint(prefix)
    np.testing.assert_allclose(reader.get_tensor("w"), kern)

    v = tf.Variable(rng.randn(4, 6).astype(np.float32))
    ck = tf.train.Checkpoint(w=v)
    path = ck.write(str(tmp_path / "theirs"))
    ours = dict(read_tensor_bundle(path))
    key = [k for k in ours if k.endswith("VARIABLE_VALUE") and "w" in k][0]
    np.testing.assert_allclose(ours[key], v.numpy())


@pytest.fixture(scope="module")
def facenet_pair():
    """Two differently-seeded FaceNets (donor with 'real' weights, fresh
    recipient) + the donor's weight stream in keras layer order."""
    import jax

    from face_detection_and_recognition_tpu.models.facenet import \
        make_facenet
    from face_detection_and_recognition_tpu.utils.weights import (
        execution_module_order, ordered_slots)

    net, donor_vars, embed = make_facenet(rng=jax.random.PRNGKey(7))
    _, fresh_vars, _ = make_facenet(rng=jax.random.PRNGKey(8))
    order = execution_module_order(net, donor_vars, (1, 160, 160, 3))
    slots = ordered_slots(donor_vars, order)

    def leaf(path, name, is_stat):
        node = donor_vars["batch_stats" if is_stat else "params"]
        for k in path:
            node = node[k]
        return np.asarray(node[name])

    stream = [leaf(p, n, st) for (p, n, _, st) in slots]
    groups = []  # (module_path, [(attr, arr)]) in execution order
    for (p, n, _, st), arr in zip(slots, stream):
        attr = {"kernel": "kernel", "bias": "bias", "scale": "gamma",
                "mean": "moving_mean", "var": "moving_variance"}[n]
        if st or n in ("mean", "var"):
            attr = {"mean": "moving_mean", "var": "moving_variance"}[n]
        elif any(x.startswith("BatchNorm") or x.endswith("_bn")
                 for x in p[-1:]):
            attr = {"bias": "beta", "scale": "gamma"}[n]
        if groups and groups[-1][0] == p:
            groups[-1][1].append((attr, arr))
        else:
            groups.append((p, [(attr, arr)]))
    return net, donor_vars, fresh_vars, embed, stream, groups


def test_facenet_stream_import_reproduces_embeddings(facenet_pair, rng):
    from face_detection_and_recognition_tpu.utils.weights import \
        convert_facenet_keras

    net, donor_vars, fresh_vars, embed, stream, _ = facenet_pair
    poured = convert_facenet_keras(stream, net, fresh_vars)
    x = rng.randn(2, 160, 160, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(embed(poured, x)),
                               np.asarray(embed(donor_vars, x)),
                               atol=1e-6)


def test_facenet_h5_fixture_import(facenet_pair, tmp_path, rng):
    """A keras-layout .h5 written from the donor imports via
    read_keras_h5_stream + convert_facenet_keras."""
    h5py = pytest.importorskip("h5py")

    from face_detection_and_recognition_tpu.utils.weights import (
        convert_facenet_keras, read_keras_h5_stream)

    net, donor_vars, fresh_vars, embed, _, groups = facenet_pair
    path = str(tmp_path / "facenet_keras.h5")
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        layer_names = []
        for i, (p, attrs) in enumerate(groups):
            lname = f"layer_{i}_{'_'.join(p) or 'root'}"
            layer_names.append(lname)
            lg = mw.create_group(lname)
            wnames = []
            for attr, arr in attrs:
                wn = f"{lname}/{attr}:0"
                lg.create_dataset(wn, data=arr)
                wnames.append(wn)
            lg.attrs["weight_names"] = np.array(
                [w.encode() for w in wnames])
        mw.attrs["layer_names"] = np.array(
            [n.encode() for n in layer_names])
    stream = read_keras_h5_stream(path)
    poured = convert_facenet_keras(stream, net, fresh_vars)
    x = rng.randn(1, 160, 160, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(embed(poured, x)),
                               np.asarray(embed(donor_vars, x)), atol=1e-6)


def test_facenet_savedmodel_dir_import(facenet_pair, tmp_path, rng):
    """A TF2-style SavedModel dir (object-graph variable names, alphabetical
    key order) imports through keras_bundle_stream — including the conv
    bias-before-kernel reordering trap."""
    from face_detection_and_recognition_tpu.utils.weights import (
        convert_facenet_keras, keras_bundle_stream)

    net, donor_vars, fresh_vars, embed, _, groups = facenet_pair
    sm = tmp_path / "facenet_keras_p38"
    (sm / "variables").mkdir(parents=True)
    (sm / "saved_model.pb").write_bytes(b"\x08\x01")  # presence marker
    tensors = []
    for i, (p, attrs) in enumerate(groups):
        for attr, arr in attrs:
            tensors.append((
                f"layer_with_weights-{i}/{attr}/.ATTRIBUTES/VARIABLE_VALUE",
                np.asarray(arr, np.float32)))
    tensors.append(("optimizer/iter/.ATTRIBUTES/VARIABLE_VALUE",
                    np.asarray(3, np.int64).reshape(())))
    write_tensor_bundle(str(sm / "variables" / "variables"), tensors)

    named = read_tensor_bundle(str(sm / "variables" / "variables"))
    stream = keras_bundle_stream(named)
    poured = convert_facenet_keras(stream, net, fresh_vars)
    x = rng.randn(1, 160, 160, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(embed(poured, x)),
                               np.asarray(embed(donor_vars, x)), atol=1e-6)


def test_similar_face_golden_harness_ready(facenet_pair, tmp_path):
    """The reference's strongest numeric golden (threshold 7.5812364 +
    pinned 128-d mean, tests/base/test_similar_faces_filter.py:30-64)
    needs real weights; this pins the harness CONTRACT so it runs the
    moment a real facenet_keras_p38 / .h5 lands: load_embed_weights
    dispatches a SavedModel dir, and ref_mean_and_threshold reproduces the
    reference's mean + max-L2 math on a known set."""
    from face_detection_and_recognition_tpu.pipelines.similarity import \
        ref_mean_and_threshold

    emb = np.zeros((3, 128), np.float32)
    emb[1, 0] = 3.0
    emb[2, 1] = 4.0
    mean, thr = ref_mean_and_threshold(emb)
    np.testing.assert_allclose(mean, emb.mean(0))
    expected = max(np.linalg.norm(e - emb.mean(0)) for e in emb)
    assert thr == pytest.approx(expected, rel=1e-6)


def test_filter_faces_cli_with_savedmodel(facenet_pair, tmp_path, rng):
    """The reference's exact flow: filter_faces -m <SavedModel dir> loads
    real-format facenet weights and routes images clean/unclean."""
    import cv2

    from face_detection_and_recognition_tpu.cli.filter_faces import main

    net, donor_vars, _, _, _, groups = facenet_pair
    sm = tmp_path / "facenet_keras_p38"
    (sm / "variables").mkdir(parents=True)
    (sm / "saved_model.pb").write_bytes(b"\x08\x01")
    tensors = []
    for i, (p, attrs) in enumerate(groups):
        for attr, arr in attrs:
            tensors.append((
                f"layer_with_weights-{i}/{attr}/.ATTRIBUTES/VARIABLE_VALUE",
                np.asarray(arr, np.float32)))
    write_tensor_bundle(str(sm / "variables" / "variables"), tensors)

    for d in ("data/person_a", "refs/person_a"):
        (tmp_path / d).mkdir(parents=True)
    for i in range(3):
        img = rng.randint(0, 255, (160, 160, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "refs/person_a" / f"r{i}.jpg"), img)
        cv2.imwrite(str(tmp_path / "data/person_a" / f"d{i}.jpg"), img)
    rc = main(["-d", str(tmp_path / "data"), "-r", str(tmp_path / "refs"),
               "-t", str(tmp_path / "out"), "-m", str(sm), "--batch", "2"])
    assert rc in (0, None)
    import os

    assert os.path.isdir(str(tmp_path / "out"))
