"""Version <-> path mapping.

Reference semantics: core/src/main/scala/dev/chronicles/core/VersionPaths.scala:
* the version directory column is named ``_version`` (:13),
* ``pathFor`` appends ``_version=<label>``; the UNVERSIONED sentinel maps to
  the bare path (:18-25) — this is how pre-existing unversioned data is
  adopted in place,
* ``parseVersion`` recovers the version from the last path segment,
  defaulting to UNVERSIONED (:30-41),
* ``versionedToBasePath`` strips the suffix (:46-57).
"""

from __future__ import annotations

from .version import UNVERSIONED, Version, is_valid_label

VERSION_COLUMN = "_version"
_PREFIX = VERSION_COLUMN + "="


def path_for(base_path: str, version: Version) -> str:
    """Append ``/_version=<label>`` unless unversioned (VersionPaths.scala:18-25)."""
    if version.is_unversioned:
        return base_path
    return base_path.rstrip("/") + "/" + _PREFIX + version.label


def parse_version(location: str) -> Version:
    """Version encoded in the last path segment, else UNVERSIONED
    (VersionPaths.scala:30-41)."""
    last = location.rstrip("/").rsplit("/", 1)[-1]
    if last.startswith(_PREFIX):
        label = last[len(_PREFIX):]
        if is_valid_label(label) and label:
            return Version(label)
    return UNVERSIONED


def versioned_to_base_path(location: str) -> str:
    """Strip a trailing ``/_version=<label>`` segment (VersionPaths.scala:46-57)."""
    trimmed = location.rstrip("/")
    head, _, last = trimmed.rpartition("/")
    if last.startswith(_PREFIX):
        return head
    return trimmed
