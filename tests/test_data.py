"""Data pipeline tests: synthetic fixtures, datasets, device augmentation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iswm_tpu.data import (
    AugmentConfig,
    BinarySegmentation,
    EvaluationDataset,
    augment_batch,
    batch_iterator,
    calculate_class_weights,
    decode_target,
    denormalize,
    generate_scene,
    normalize,
    val_transform_batch,
    write_dataset,
)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    write_dataset(str(root), n_train=6, n_val=4, size=(64, 64), seed=1)
    return str(root)


def test_generate_scene_statistics():
    rng = np.random.default_rng(0)
    waves = 0
    for _ in range(20):
        img, mask = generate_scene(rng, size=(64, 64))
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        assert mask.shape == (64, 64) and set(np.unique(mask)) <= {0, 1}
        waves += mask.any()
    assert 8 <= waves <= 20  # wave_probability 0.8


def test_binary_segmentation_contract(dataset_root):
    ds = BinarySegmentation(dataset_root, split="train")
    assert len(ds) == 6
    assert ds.images == sorted(ds.images)  # filename == timestamp order
    img, lbl = ds[0]
    assert img.shape == (64, 64, 3) and lbl.shape == (64, 64)
    assert set(np.unique(lbl)) <= {0, 1}
    rgb = BinarySegmentation.decode_target(lbl)
    assert rgb.shape == (64, 64, 3)
    assert np.array_equal(np.unique(rgb), np.unique(lbl) * 255)


def test_evaluation_dataset_4tuple(dataset_root):
    ds = EvaluationDataset(dataset_root, split="val")
    out, label, name, raw = ds[0]
    assert out.shape == raw.shape == (64, 64, 3)
    assert name.endswith(".png")


def test_batch_iterator_shapes(dataset_root):
    ds = BinarySegmentation(dataset_root, split="train")
    it = batch_iterator(ds, 4, shuffle=True, drop_last=True, epochs=1)
    batches = list(it)
    assert len(batches) == 1  # 6 samples, drop_last
    imgs, lbls = batches[0]
    assert imgs.shape == (4, 64, 64, 3) and lbls.shape == (4, 64, 64)


def test_augment_batch_static_shapes_and_labels():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (4, 48, 48, 3), dtype=np.uint8)
    lbls = (rng.random((4, 48, 48)) > 0.8).astype(np.int32)
    cfg = AugmentConfig(crop_size=32)
    out_i, out_l = augment_batch(jax.random.key(0), jnp.asarray(imgs), jnp.asarray(lbls), cfg)
    assert out_i.shape == (4, 32, 32, 3)
    assert out_l.shape == (4, 32, 32)
    assert set(np.unique(np.asarray(out_l))) <= {0, 1}  # nearest keeps label set
    assert np.isfinite(np.asarray(out_i)).all()


def test_augment_scale_identity_is_crop():
    # scale fixed to 1.0, no flip -> output is exactly a crop of normalize(img)
    imgs = np.arange(1 * 16 * 16 * 3, dtype=np.uint8).reshape(1, 16, 16, 3) % 255
    lbls = np.zeros((1, 16, 16), np.int32)
    cfg = AugmentConfig(crop_size=8, scale_min=1.0, scale_max=1.0, hflip_prob=0.0)
    out_i, _ = augment_batch(jax.random.key(1), jnp.asarray(imgs), jnp.asarray(lbls), cfg)
    full = normalize(jnp.asarray(imgs[0]).astype(jnp.float32) / 255.0)
    # find the crop offset by matching the first row/col value
    found = False
    for top in range(9):
        for left in range(9):
            if np.allclose(np.asarray(out_i[0]), np.asarray(full[top : top + 8, left : left + 8]), atol=1e-5):
                found = True
    assert found


def test_augment_pad_when_scaled_smaller():
    # scale 0.5 of 16 -> 8 < crop 12: centered pad with zeros (both img & lbl)
    imgs = np.full((1, 16, 16, 3), 255, np.uint8)
    lbls = np.ones((1, 16, 16), np.int32)
    cfg = AugmentConfig(crop_size=12, scale_min=0.5, scale_max=0.5, hflip_prob=0.0)
    out_i, out_l = augment_batch(jax.random.key(2), jnp.asarray(imgs), jnp.asarray(lbls), cfg)
    lbl = np.asarray(out_l[0])
    # PIL pads int((1+12-8)/2)=2 on each side -> content occupies rows/cols 2..9
    assert lbl[:2].sum() == 0 and lbl[-2:].sum() == 0
    assert lbl[2:10, 2:10].all()


def test_val_transform_and_denormalize_roundtrip():
    imgs = np.random.default_rng(3).integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    out = val_transform_batch(jnp.asarray(imgs))
    back = denormalize(out)
    np.testing.assert_allclose(np.asarray(back), imgs / 255.0, atol=1e-5)


def test_class_weights():
    # 3/4 background, 1/4 foreground -> w1 = sqrt(3)
    lbls = np.zeros((1, 4, 4), np.int32)
    lbls[0, :2, :2] = 1
    w = calculate_class_weights([lbls])
    assert w[0] == 1.0
    assert w[1] == pytest.approx(np.sqrt(3), abs=1e-6)


def test_class_weights_ignores_255():
    lbls = np.full((1, 2, 2), 255, np.int32)
    w = calculate_class_weights([lbls])
    assert w.tolist() == [1.0, 1.0]


def test_prefetch_loader_matches_plain(dataset_root):
    from iswm_tpu.data import BinarySegmentation, batch_iterator
    from iswm_tpu.data.loader import PrefetchLoader

    ds = BinarySegmentation(dataset_root, split="train")
    plain = list(batch_iterator(ds, 2, epochs=1))
    pre = list(PrefetchLoader(batch_iterator(ds, 2, epochs=1), depth=2))
    assert len(plain) == len(pre)
    for (a, la), (b, lb) in zip(plain, pre):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)


def test_prefetch_loader_propagates_errors():
    from iswm_tpu.data.loader import PrefetchLoader

    def boom():
        yield (np.zeros(1), np.zeros(1))
        raise RuntimeError("decode failed")

    it = iter(PrefetchLoader(boom(), depth=1))
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_device_prefetch_places_on_mesh(dataset_root):
    from iswm_tpu.data import BinarySegmentation, batch_iterator
    from iswm_tpu.data.loader import device_prefetch_iterator
    from iswm_tpu.parallel import make_mesh

    mesh = make_mesh()
    it = device_prefetch_iterator(
        batch_iterator(BinarySegmentation(dataset_root, split="train"), 8,
                       epochs=2, drop_last=False),
        mesh=mesh,
    )
    # 6-sample batches are not divisible by 8 devices: the sharding error
    # raised in the prefetch thread must surface at the consumer
    with pytest.raises(ValueError, match="divisible"):
        next(it)


def test_sequence_generator_temporal_coherence():
    from iswm_tpu.data.synthetic import generate_sequence
    from iswm_tpu.metrics import calculate_stability

    rng = np.random.default_rng(11)
    # find a sequence with a wave
    for _ in range(10):
        frames = generate_sequence(rng, length=4, size=(96, 96))
        if frames[0][1].any():
            break
    assert frames[0][1].any()
    # consecutive frames have high front stability (smooth drift)
    stab = calculate_stability(frames[1][1], frames[0][1])
    assert stab > 0.5
    # masks differ between frames (the wave moves)
    assert not np.array_equal(frames[0][1], frames[-1][1])


def test_write_sequence_dataset(tmp_path):
    from iswm_tpu.data.synthetic import write_sequence_dataset
    from iswm_tpu.data import BinarySegmentation

    root = write_sequence_dataset(str(tmp_path), n_sequences=2, length=3,
                                  size=(48, 48), seed=5)
    ds = BinarySegmentation(root, split="val")
    assert len(ds) == 6
    assert ds.images == sorted(ds.images)


@pytest.mark.parametrize("angle", [0.0, 7.0, -13.5, 30.0, 90.0])
def test_rotate_pair_matches_pil(angle):
    """Golden parity of rotate_pair vs PIL F.rotate (the ExtRandomRotation
    backend, reference ext_transforms.py:201): BILINEAR image / NEAREST
    label, expand=False, center rotation, fill 0."""
    from PIL import Image

    from iswm_tpu.data.transforms import rotate_pair

    rng = np.random.default_rng(3)
    h, w = 64, 80
    img_u8 = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    lbl_u8 = (rng.random((h, w)) > 0.7).astype(np.uint8)

    ref_img = np.asarray(
        Image.fromarray(img_u8).rotate(angle, resample=Image.BILINEAR)
    ).astype(np.float32) / 255.0
    ref_lbl = np.asarray(Image.fromarray(lbl_u8).rotate(angle))  # NEAREST

    img, lbl = jax.jit(rotate_pair)(
        jnp.asarray(img_u8, jnp.float32) / 255.0, jnp.asarray(lbl_u8), angle
    )
    img, lbl = np.asarray(img), np.asarray(lbl)

    # labels: NEAREST should agree except float-tie boundary pixels
    assert (lbl != ref_lbl).mean() < 0.02
    # image: bilinear within uint8 quantization except edge-tap pixels
    close = np.isclose(img, ref_img, atol=3 / 255.0)
    assert close.mean() > 0.98
    if angle == 0.0:
        np.testing.assert_allclose(img, ref_img, atol=1 / 255.0)
        np.testing.assert_array_equal(lbl, lbl_u8)


def test_random_rotation_angle_range_and_shapes():
    from iswm_tpu.data.transforms import random_rotation, rotate_pair

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    lbl = jnp.asarray((rng.random((32, 32)) > 0.5), jnp.uint8)
    out_img, out_lbl = random_rotation(jax.random.key(1), img, lbl, degrees=5.0)
    assert out_img.shape == img.shape and out_lbl.shape == lbl.shape
    assert out_lbl.dtype == lbl.dtype
    # degrees=0 must be identity regardless of key
    same_img, same_lbl = random_rotation(jax.random.key(2), img, lbl, degrees=0.0)
    np.testing.assert_allclose(np.asarray(same_img), np.asarray(img), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(same_lbl), np.asarray(lbl))
    # scalar degrees d means (-d, d): a large-angle draw differs from input
    rot_img, _ = rotate_pair(img, lbl, 45.0)
    assert not np.allclose(np.asarray(rot_img), np.asarray(img))
