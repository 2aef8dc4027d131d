"""Reference-shaped ``config.ini`` support (SURVEY §3.1; VERDICT r7 #3).

The reference CLI takes ``--config`` (hisscube.py:41-42) pointing at an
INI file (config/config.ini) — the single file its users edit for zoom
counts, cutout size, ingest limits, index orders and patterns, parsed by
``hisscube/utils/config.py`` with ``configparser(allow_no_value=True,
inline_comment_prefixes='#')``. This module reads the SAME file shape and
maps the keys that have a Spark-engine analog onto :class:`CubePipeline` /
ingest knobs. Keys that configure HDF5/MPI physics (chunk sizes, subfiling,
MPI batch sizes, header-array preallocations) have no meaning on Spark and
are accepted-and-ignored, so a real user's config.ini loads as-is.

Key mapping (reference key → engine knob):

===============================  =======================================
``Handler.IMAGE_CUTOUT_SIZE``    ``cutout_size``
``Handler.IMG_ZOOM_CNT`` /       ``zooms`` = max(img, spec) + 1 (the
``Handler.SPEC_ZOOM_CNT``        reference counts zooms BELOW full res;
                                 zoom 0 is the original)
``Writer.IMAGE_PATTERN``         ``image_pattern``
``Writer.SPECTRA_PATTERN``       ``spectra_pattern``
``Writer.MAX_CUTOUT_REFS``       ``max_refs`` (crossmatch ref cap, O3)
``Writer.LIMIT_IMAGE_COUNT``     ``limit_image_count`` (file-count cap)
``Writer.LIMIT_SPECTRA_COUNT``   ``limit_spectra_count``
``SDSS.IMG_DIAMETER_ANG_MIN``    ``match_radius_deg`` = value/60 (the 8
                                 arcmin image radius the default 0.133°
                                 comes from, config.ini:79)
``SDSS.REBIN_SAMPLES``           ``rebin_samples``
``Builder.CREATE_ML_CUBE``       ``create_ml_cube`` (gold phase toggle)
``Builder.CREATE_VISUALIZATION_CUBE`` ``create_visualization_cube``
===============================  =======================================

Precedence: explicit CLI flags > config file > built-in defaults —
resolved in ``__main__.py`` (flags default to None; a None falls through
to the config value, then to the default).
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, fields


@dataclass
class HissCubeConfig:
    """Engine-relevant subset of the reference's Config object."""

    cutout_size: int | None = None
    zooms: int | None = None
    image_pattern: str | None = None
    spectra_pattern: str | None = None
    max_refs: int | None = None
    limit_image_count: int | None = None
    limit_spectra_count: int | None = None
    match_radius_deg: float | None = None
    rebin_samples: int | None = None
    create_ml_cube: bool | None = None
    create_visualization_cube: bool | None = None

    @classmethod
    def from_ini(cls, path: str) -> "HissCubeConfig":
        # same parser options as the reference (utils/config.py:15): bare
        # keys allowed (IMAGE_CHUNK_SIZE has no value), '#' starts an
        # inline comment
        cp = configparser.ConfigParser(
            allow_no_value=True, inline_comment_prefixes="#"
        )
        read = cp.read(path)
        if not read:
            raise FileNotFoundError(f"config file not readable: {path}")

        def _get(section: str, key: str, conv):
            try:
                raw = cp.get(section, key)
            except (configparser.NoSectionError, configparser.NoOptionError):
                return None
            if raw is None or raw.strip() == "":
                return None
            return conv(raw.strip())

        def _bool(raw: str) -> bool:
            return raw.strip().lower() in ("1", "yes", "true", "on")

        img_zoom = _get("Handler", "IMG_ZOOM_CNT", int)
        spec_zoom = _get("Handler", "SPEC_ZOOM_CNT", int)
        zooms = None
        if img_zoom is not None or spec_zoom is not None:
            zooms = max(z for z in (img_zoom, spec_zoom) if z is not None) + 1

        diam = _get("SDSS", "IMG_DIAMETER_ANG_MIN", float)

        return cls(
            cutout_size=_get("Handler", "IMAGE_CUTOUT_SIZE", int),
            zooms=zooms,
            image_pattern=_get("Writer", "IMAGE_PATTERN", str),
            spectra_pattern=_get("Writer", "SPECTRA_PATTERN", str),
            max_refs=_get("Writer", "MAX_CUTOUT_REFS", int),
            limit_image_count=_get("Writer", "LIMIT_IMAGE_COUNT", int),
            limit_spectra_count=_get("Writer", "LIMIT_SPECTRA_COUNT", int),
            match_radius_deg=(diam / 60.0) if diam is not None else None,
            rebin_samples=_get("SDSS", "REBIN_SAMPLES", int),
            create_ml_cube=_get("Builder", "CREATE_ML_CUBE", _bool),
            create_visualization_cube=_get(
                "Builder", "CREATE_VISUALIZATION_CUBE", _bool
            ),
        )

    def merged_under(self, **explicit) -> dict:
        """Resolve flag > config > caller-default for the given knobs.

        ``explicit`` maps knob name → CLI value-or-None; a None falls
        through to this config's value (which may itself be None, meaning
        'use the built-in default')."""
        out = {}
        known = {f.name for f in fields(self)}
        for name, flag_val in explicit.items():
            if name not in known:
                raise KeyError(name)
            out[name] = flag_val if flag_val is not None else getattr(self, name)
        return out


from hiss_cube_spark._serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
