"""Few-shot suggestor: single-color shortcut, 2-class fit quality, warm-start
caching (reference suggestor.py semantics)."""

import numpy as np
import pytest
from conftest import isolated_process

from interactive_unet_tpu.engine.suggestor import Suggestor, make_suggestions
from interactive_unet_tpu.ops import colors as C


def test_single_class_constant(rng):
    mask = np.zeros((32, 32, 3), np.uint8)
    mask[4:8, 4:8] = C.COLORS[2]
    img = rng.random((32, 32)).astype(np.float32)
    suggestion, model = make_suggestions(img, mask)
    assert suggestion.shape == (32, 32, 3)
    np.testing.assert_array_equal(suggestion[0, 0], C.COLORS[2])
    np.testing.assert_array_equal(suggestion[-1, -1], C.COLORS[2])


def test_no_annotation_returns_none(rng):
    mask = np.zeros((32, 32, 3), np.uint8)
    img = rng.random((32, 32)).astype(np.float32)
    suggestion, _ = make_suggestions(img, mask)
    assert suggestion is None


def test_two_class_fit_separates(rng):
    """A linearly-separable slice should be segmented correctly after the
    30-step fit."""
    s = 64
    img = np.zeros((s, s), np.float32)
    img[:, s // 2:] = 1.0
    mask = np.zeros((s, s, 3), np.uint8)
    mask[8:24, 8:16] = C.COLORS[1]      # stroke on dark side
    mask[8:24, 48:56] = C.COLORS[2]     # stroke on bright side

    sug = Suggestor(num_channels=1, num_classes=2, steps=60, lr=3e-3, seed=0)
    suggestion, sug = sug.make_suggestions(img, mask)

    left = suggestion[:, : s // 2 - 4]
    right = suggestion[:, s // 2 + 4:]
    left_ok = (left == C.COLORS[1]).all(-1).mean()
    right_ok = (right == C.COLORS[2]).all(-1).mean()
    assert left_ok > 0.7, f"left accuracy {left_ok}"
    assert right_ok > 0.7, f"right accuracy {right_ok}"


def test_warm_start_reuses_params(rng):
    s = 32
    img = rng.random((s, s)).astype(np.float32)
    mask = np.zeros((s, s, 3), np.uint8)
    mask[2:6, 2:6] = C.COLORS[1]
    mask[20:24, 20:24] = C.COLORS[2]
    sug = Suggestor(num_channels=1, num_classes=2, steps=5, seed=0)
    _, sug = sug.make_suggestions(img, mask)
    p1 = sug.params
    _, sug = sug.make_suggestions(img, mask)
    assert sug.params is not None and p1 is not None
    # same compiled function object reused (no rebuild)
    assert sug._fit_fn is not None


def test_upload_cache_uses_slice_token(rng):
    """The image must upload to device once per slice, not once per stroke
    (reference caches the suggestor model per slice, app.py:757-768)."""
    s = 32
    img = rng.random((s, s)).astype(np.float32)
    mask = np.zeros((s, s, 3), np.uint8)
    mask[2:6, 2:6] = C.COLORS[1]
    mask[20:24, 20:24] = C.COLORS[2]

    sug = Suggestor(num_channels=1, num_classes=2, steps=3, seed=0)
    _, sug = sug.make_suggestions(img.copy(), mask, slice_token=7)
    assert sug.x_uploads == 1
    mask[10:12, 10:12] = C.COLORS[1]  # second stroke, same slice
    # fresh host array (as SessionState.image_features produces) — the token,
    # not object identity, must drive the cache
    _, sug = sug.make_suggestions(img.copy(), mask, slice_token=7)
    assert sug.x_uploads == 1
    # slice change -> re-upload + params reset
    img2 = rng.random((s, s)).astype(np.float32)
    _, sug = sug.make_suggestions(img2, mask, slice_token=8)
    assert sug.x_uploads == 2


def test_compiled_program_shared_across_instances():
    """Slice changes discard the Suggestor instance; the compiled program
    must survive (module-level cache), or every slice change recompiles."""
    a = Suggestor(num_channels=1, num_classes=2, steps=3, seed=0)
    b = Suggestor(num_channels=1, num_classes=2, steps=3, seed=1)
    assert a._fit_fn is b._fit_fn
    assert a.model is b.model


@isolated_process
def test_fit_stride_quality(rng):
    """Working-resolution fit (fit_stride=2): 4x less fit work, final
    inference still full-res, quality preserved on a separable slice."""
    s = 64
    img = np.zeros((s, s), np.float32)
    img[:, s // 2:] = 1.0
    mask = np.zeros((s, s, 3), np.uint8)
    mask[8:24, 8:16] = C.COLORS[1]
    mask[8:24, 48:56] = C.COLORS[2]

    sug = Suggestor(num_channels=1, num_classes=2, steps=60, lr=3e-3,
                    seed=0, fit_stride=2)
    suggestion, _ = sug.make_suggestions(img, mask)
    assert suggestion.shape == (s, s, 3)  # full-res output
    left_ok = (suggestion[:, : s // 2 - 4] == C.COLORS[1]).all(-1).mean()
    right_ok = (suggestion[:, s // 2 + 4:] == C.COLORS[2]).all(-1).mean()
    assert left_ok > 0.7 and right_ok > 0.7, (left_ok, right_ok)


@isolated_process
def test_pretrained_suggestor_grafts(tmp_path, monkeypatch, rng):
    """Suggestor(pretrained=True, mobilenet_v2) starts the 30-step fit from
    grafted torch weights (reference suggestor.py:22-25 uses ImageNet
    mobilenet_v2) and still produces a valid 2-class suggestion."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import torch
    from test_torch_import import _tv_features

    torch.save(_tv_features(seed=4).state_dict(), tmp_path / "mobilenet_v2.pt")
    monkeypatch.setenv("IUNET_PRETRAINED_DIR", str(tmp_path))

    mask = np.zeros((32, 32, 3), np.uint8)
    mask[2:8, 2:30] = C.COLORS[1]
    mask[24:30, 2:30] = C.COLORS[2]
    img = np.zeros((32, 32), np.float32)
    img[16:] = 1.0

    sug = Suggestor(num_channels=1, num_classes=2,
                    encoder_name="mobilenet_v2", pretrained=True)
    suggestion, _ = sug.make_suggestions(img, mask)
    assert suggestion.shape == (32, 32, 3)
    assert suggestion.dtype == np.uint8

    # pretrained=True with no weights on disk fails loudly, not silently —
    # disable the ~/.cache fallback dir too (the env var only PREPENDS to
    # default_search_dirs, so a populated user cache would mask the error)
    from interactive_unet_tpu.utils import torch_import as TI
    monkeypatch.setattr(TI, "default_search_dirs",
                        lambda: [tmp_path / "empty"])
    sug2 = Suggestor(num_channels=1, num_classes=2,
                     encoder_name="resnet18", pretrained=True)
    with pytest.raises(RuntimeError, match="no local torch checkpoint"):
        sug2.make_suggestions(img, mask)
    # and it keeps failing loudly on retry (the ungrafted init params must
    # not be cached by the failed attempt)
    with pytest.raises(RuntimeError, match="no local torch checkpoint"):
        sug2.make_suggestions(img, mask)
