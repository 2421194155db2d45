"""Job configuration + validation.

Mirrors the reference's ``ProcessingConfig`` contract
(/root/reference/pdf2ocr/config.py:16-152 and main.py:158-175):

- at least one output format must be requested            (config.py:96-112)
- layout-preserving mode is exclusive: it disables every reflowed format
  and forces layout output                                 (config.py:114-136)
- epub implies docx (the reference converts DOCX->EPUB)    (config.py:137-146)
- dpi in [72, 1200], workers >= 1, batch_size >= 1 or None,
  max_sentences 0 -> None                                  (main.py:158-175)

Validation runs driver-side before any Spark action (SURVEY.md §2.8).
"""

from __future__ import annotations

import re
import warnings
from dataclasses import dataclass, field
from typing import Optional, Tuple

from pdf2ocr_spark.kernel.emit import ALL_FORMATS

VALID_FORMATS = set(ALL_FORMATS) | {"layout_text"}

# reference epub.py:11-27 Tesseract->Calibre language map; also the
# engine's supported-language table for driver-side --lang validation
# (the analogue of ref ocr.py:450-493 validate_tesseract_language, which
# checks the requested code against `tesseract --list-langs` and fails
# fast instead of silently degrading on a typo'd code).
TESS_TO_CALIBRE = [
    ("por", "pt"), ("eng", "en"), ("spa", "es"), ("fra", "fr"), ("deu", "de"),
    ("ita", "it"), ("nld", "nl"), ("rus", "ru"), ("tur", "tr"), ("jpn", "ja"),
    ("chi_sim", "zh"), ("heb", "he"),
]

SUPPORTED_LANGS = frozenset(t for t, _ in TESS_TO_CALIBRE)

#: tesseract traineddata naming shape: 3-letter ISO-639-2 base plus an
#: optional script/variant suffix ('chi_sim', 'aze_cyrl', 'frk')
_TESS_CODE_SHAPE = re.compile(r"^[a-z]{3}(_[a-z]+)?$")


class ConfigError(ValueError):
    pass


@dataclass
class ExtractConfig:
    formats: Tuple[str, ...] = ALL_FORMATS
    lang: str = "eng"
    preserve_layout: bool = False
    epub: bool = False
    dpi: int = 400
    num_partitions: Optional[int] = None
    batch_size: Optional[int] = None
    max_sentences: Optional[int] = None
    #: The reference validates --lang against the INSTALLED model list
    #: (`tesseract --list-langs`) and rejects anything else (ref
    #: ocr.py:450-493). This engine has no tesseract install to probe, so
    #: by default it matches the reference's fail-fast: only codes in
    #: TESS_TO_CALIBRE pass. Opting in accepts any tesseract-SHAPED code
    #: (3-letter base, optional _script suffix, '+'-combinable) with a
    #: warning — the deliberate relaxation for deployments whose OCR
    #: runtime has more traineddata than the engine's known map.
    allow_unknown_langs: bool = False
    effective_formats: Tuple[str, ...] = field(init=False)

    def __post_init__(self) -> None:
        fmts = tuple(self.formats)
        unknown = set(fmts) - VALID_FORMATS
        if unknown:
            raise ConfigError(f"unknown formats: {sorted(unknown)}")

        if self.preserve_layout:
            # layout mode is exclusive and forces layout output
            # (ref config.py:114-136: other formats disabled, PDF forced)
            fmts = ("layout_text",)
        else:
            if self.epub and "docx_para" not in fmts:
                # epub requires docx (ref config.py:137-146)
                fmts = fmts + ("docx_para",)
            if not fmts:
                raise ConfigError(
                    "at least one output format is required (ref config.py:96-112)"
                )

        # Codes in TESS_TO_CALIBRE are fully known; anything else fails
        # fast like the reference's typo check (ref ocr.py:450-493) unless
        # allow_unknown_langs opts into accepting tesseract-shaped codes
        # with a warning (see the field docstring; the engine has no
        # per-language behavior beyond the 'por' charset clean and the
        # epub map, which defaults unknown codes to English — ref
        # epub.py:86).
        for part in self.lang.split("+"):
            if part in SUPPORTED_LANGS:
                continue
            if self.allow_unknown_langs and _TESS_CODE_SHAPE.match(part):
                warnings.warn(
                    f"OCR language {part!r} is outside the engine's known map "
                    f"{sorted(SUPPORTED_LANGS)}; accepted (no language-specific "
                    "behavior; epub lang maps to 'en' — ref epub.py:86)",
                    stacklevel=2,
                )
                continue
            raise ConfigError(
                f"unsupported OCR language {part!r}; known: "
                f"{sorted(SUPPORTED_LANGS)} (ref ocr.py:450-493 validates "
                "against `tesseract --list-langs`; pass "
                "allow_unknown_langs=True to accept other "
                "tesseract-shaped codes with a warning)"
            )
        if not 72 <= self.dpi <= 1200:
            raise ConfigError("dpi must be within [72, 1200] (ref main.py:166-168)")
        if self.num_partitions is not None and self.num_partitions < 1:
            raise ConfigError("num_partitions must be >= 1 (ref main.py:158-160)")
        if self.batch_size is not None and self.batch_size < 1:
            raise ConfigError("batch_size must be >= 1 (ref main.py:161-165)")
        if self.max_sentences is not None and self.max_sentences < 0:
            raise ConfigError("max_sentences must be >= 0 (ref main.py:169-175)")
        # CLI maps 0 -> None = "no split" (ref main.py:174-175)
        if self.max_sentences == 0:
            object.__setattr__(self, "max_sentences", None)

        object.__setattr__(self, "effective_formats", fmts)
