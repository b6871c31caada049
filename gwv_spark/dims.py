"""Dimension inputs for the config-driven rules.

The reference ships two YAML config files (naming.yaml, jv.yaml), builds
two JSON dims at package-build time from Unicode sources (cjksrc, mj),
and lazily scrapes several GlyphWiki wiki groups over HTTP
(helper.py:157-183).  The engine takes ALL of these as input tables /
plain dicts — no network, per the north rule.  Deterministic synthetic
fixtures below stand in for the build-time and network dims; the YAML
configs are read from an explicit path (defaulting to the reference's
copies when present, since they are runtime *data*, not code).
"""

from __future__ import annotations

from pathlib import Path

REFERENCE_DATA = Path("/root/reference/gwv/data")

# ------------------------------------------------------------------ yaml

def load_naming_rules(path: str | Path | None = None) -> dict[str, dict]:
    """{ruleset: {'strings': set[str], 'regex': str|None}} — regex is the
    '|'-joined alternation, fullmatch semantics (naming.py:46-58)."""
    import yaml

    p = Path(path) if path else REFERENCE_DATA / "naming.yaml"
    if not p.exists():
        return {
            k: {"strings": set(), "regex": None}
            for k in ["rule", "rule-novar", "rule-nohenka", "rule-novar-nohenka",
                      "dont-create", "deprecated-rule"]
        }
    data = yaml.safe_load(p.read_text())
    out = {}
    for key, value in data.items():
        patterns = value.get("regex", []) or []
        out[key] = {
            "strings": set(value.get("string", []) or []),
            "regex": "|".join(patterns) if patterns else None,
        }
    return out


def load_jv_config(path: str | Path | None = None) -> dict:
    """{'no_use_part': {part: replacement}, 'no_apply': [names]}
    (jv.yaml via j.py:80-99)."""
    import yaml

    p = Path(path) if path else REFERENCE_DATA / "jv.yaml"
    if not p.exists():
        return {"no_use_part": {}, "no_apply": []}
    data = yaml.safe_load(p.read_text())
    return {
        # {use: [no_use, ...]} — j.py:81-86 inverts this through alias closures
        "no_use_part": {k: list(v or []) for k, v in (data.get("no-use-part", {}) or {}).items()},
        "no_apply": list(data.get("no-apply-jv", []) or []),
    }


# ----------------------------------------------------------- fixtures

def synth_cjksrc(n_docs: int = 5000) -> dict[str, list[str | None]]:
    """Deterministic stand-in for data/3rd/cjksrc.json: {ucs: 12 columns}
    (helper.py:199-242).  Covers the corpus's kanji band with varied
    region-source patterns, plus compat-variant rows for uf9xx."""
    out: dict[str, list[str | None]] = {}
    for k in range(0, 600):
        cp = 0x4E00 + k
        ucs = f"u{cp:04x}"
        row: list[str | None] = [None] * 12
        if k % 3 != 2:
            row[0] = f"G0-{k:04d}"  # G source
        if k % 4 != 3:
            row[2] = f"J0-{k:04d}"  # J source
        if k % 5 == 0:
            row[3] = f"K0-{k:04d}"
        if k % 7 == 0:
            row[5] = f"V0-{k:04d}"
        out[ucs] = row
    # compatibility ideographs uf900.. → variant back into the URO band
    for k in range(0, 40):
        ucs = f"uf9{k:02x}"
        row = [None] * 12
        row[11] = f"U+{0x4E00 + 7 * k:04X}"
        out[ucs] = row
    return out


def synth_groups() -> dict[str, list[str]]:
    """Deterministic stand-in for the GlyphWiki wiki groups the reference
    fetches over HTTP (helper.py:157-183; users: j.py:68, width.py:44-50,
    naming.py:66-71)."""
    halfwidth_bmp = [f"u00{0x41 + i:02x}" for i in range(16)] + ["uff61"]
    cdp_pairs: list[str] = []
    for i in range(8):
        cdp_pairs += [f"cdp-8c{0x40 + i:02x}", f"u{0x4E40 + i:04x}"]
    return {
        "HalfwidthGlyphs-BMP": halfwidth_bmp,
        "HalfwidthGlyphs-SMP": [f"u1d5{0x38 + i:02x}" for i in range(4)],
        "HalfwidthGlyphs-nonUCS": ["halfsign-x", "halfsign-y"],
        "HalfwidthGlyphs-sans": [f"u00{0x61 + i:02x}-sans" for i in range(4)],
        "NonSpacingGlyphs-Halfwidth": [f"u03{i:02x}" for i in range(4)],
        "UCSで符号化されたCDP外字": cdp_pairs,
        "原規格分離": [f"u{0x4E00 + 9 * i:04x}" for i in range(30)],
    }


def synth_mj() -> list[list]:
    """Deterministic stand-in for data/3rd/mj.json (mj.py:192-207):
    rows of 13 fields (jmj, koseki, juki, nyukan, x0213, x0212, ucs, ivs,
    svs, toki, dkw, shincho, sdjt); values str | list[str] | None.

    Rows 0-39 are internally consistent with the synthetic corpus's
    koseki/toki/ucs naming; rows 40-59 cross-wire koseki keys so toki
    aliases hit the WRONG_ENTITY branch; a few rows carry compat-UCS or
    list-valued columns to exercise get()'s branches.  The remaining
    field columns (juki/nyukan/x0212/ivs/svs/dkw/shincho/sdjt) are
    populated on deterministic modular strides so every
    glyphname_to_field_key / key2gw family branch (mj.py:93-177) is
    reachable from directed inputs (tests/test_directed_branches.py)."""
    rows: list[list] = []
    for i in range(60):
        row: list = [None] * 13
        row[0] = f"{i:06d}" if i % 5 != 4 else f"09{i:04d}"  # jmj
        if i < 40:
            row[1] = f"{i * 8:06d}"  # koseki, aligned
        else:
            row[1] = f"{(i - 40) * 8:06d}"  # cross-wired to an earlier row
        row[9] = f"00{i * 8:06d}"  # toki
        if i % 7 == 3:
            row[6] = [f"{0x4E00 + i:04x}", f"f9{i % 40:02x}"]  # list + compat
        elif i % 3 != 2:
            row[6] = f"{0x4E00 + i:04x}"  # ucs
        if i % 11 == 6:
            row[4] = f"1-{0x3021 + i:04x}"  # x0213 plane 1
        elif i % 11 == 7:
            row[4] = f"2-{0x3021 + i:04x}"  # x0213 plane 2
        if i % 2 == 0:
            row[2] = f"{0x3000 + i:04x}"  # juki
        if i % 5 == 0:
            row[3] = f"e{i:03x}"  # nyukan
        if i % 4 == 1:
            row[5] = f"{0x2121 + i:04x}"  # x0212 (jsp)
        if i % 6 == 1:
            row[7] = f"u{0x4E00 + i:04x}-ue0100"  # ivs
        if i % 6 == 2:
            row[8] = f"u{0x4E00 + i:04x}-ufe00"  # svs
        if i % 3 == 0:
            row[10] = f"{i:05d}"  # dkw
        elif i == 7:
            row[10] = "h1234"  # dkw h-prefix shape
        if i % 4 == 2:
            row[11] = f"{10000 + i:05d}"  # shincho
        if i % 5 == 3:
            row[12] = f"{20000 + i:05d}"  # sdjt
        rows.append(row)
    return rows


def default_dims() -> dict:
    """The standard dims bundle used when the caller supplies none:
    YAML configs + the synthetic fixtures (mirrors what
    patch_reference_loaders injects into the reference for parity)."""
    return {
        "naming_rules": load_naming_rules(),
        "jv": load_jv_config(),
        "groups": synth_groups(),
        "cjksrc": synth_cjksrc(),
        "mj": synth_mj(),
    }


def patch_reference_loaders(groups: dict[str, list[str]] | None = None,
                            cjksrc: dict | None = None) -> None:
    """Inject the fixtures into an imported reference copy so the
    differential tests never touch the network or missing build data.
    Must run before gwv.validators.{naming,width,j,related,mj} import."""
    import gwv.helper as H

    groups = groups if groups is not None else synth_groups()
    cjksrc = cjksrc if cjksrc is not None else synth_cjksrc()

    def load(self):  # replaces GWGroupLazyLoader.load (helper.py:173-178)
        glyphs = groups.get(self.groupname, [])
        self.data = set(glyphs) if self.isset else list(glyphs)

    H.GWGroupLazyLoader.load = load
    H.cjk_sources.data = cjksrc

    # the missing build-time JSON dims (bdat/): serve fixtures instead
    real_load = H.load_package_data

    def load_package_data(name):
        if name == "data/3rd/cjksrc.json":
            return cjksrc
        if name == "data/3rd/mj.json":
            return synth_mj()
        return real_load(name)

    H.load_package_data = load_package_data
