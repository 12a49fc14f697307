"""The web client's <select> lists must stay in sync with the registry —
an option the backend doesn't know raises on train; a registry name the UI
omits is silently unreachable (the bug class behind the round-3 'set action
flat keys' fix)."""

import re
from pathlib import Path

from interactive_unet_tpu import models

CLIENT = (Path(__file__).parent.parent / "interactive_unet_tpu" / "session"
          / "client.html").read_text()


def _options(select_id: str) -> list[str]:
    m = re.search(rf'<select id="{select_id}">(.*?)</select>', CLIENT,
                  re.DOTALL)
    assert m, f"select #{select_id} not found in client.html"
    return re.findall(r"<option[^>]*>([^<]+)</option>", m.group(1))


def test_architecture_options_match_registry():
    assert _options("architecture") == models.ARCHITECTURES


def test_encoder_options_known_to_registry():
    opts = _options("encoder_name")
    assert opts, "encoder select is empty"
    unknown = [o for o in opts if o not in models.ENCODERS]
    assert not unknown, f"UI offers encoders the registry lacks: {unknown}"


def test_registry_encoders_reachable_from_ui():
    # saved-config compatibility aliases are deliberately not UI options
    aliases = {"resnet", "timm-tf_efficientnet_lite0"}
    opts = set(_options("encoder_name"))
    missing = [e for e in models.ENCODERS if e not in opts | aliases]
    assert not missing, f"registry encoders unreachable from the UI: {missing}"
