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


# ---------------------------------------------------------------------------
# Hive-style partition-directory escaping.
#
# Spark's partitionBy writes directory names with Hive's escapePathName
# charset (percent-escaped %XX, uppercase hex); partition VALUES in the
# commit log stay raw, and the escaping is applied exactly where values
# become filesystem path segments (and undone when parsing them back).
# Charset per Hive FileUtils.escapePathName / Spark ExternalCatalogUtils.

_ESCAPE_CHARS = frozenset('"#%\'*/:=?\\\x7f{[]^') | frozenset(
    chr(i) for i in range(0x20)
)


def escape_path_name(value: str) -> str:
    """Raw partition value → Hive-escaped directory-name fragment.

    Fast path first: almost every real value is clean, and this runs
    once per partition per current-view read (10⁶ times on a wide
    table) — one C-speed disjoint check beats the per-char loop."""
    if _ESCAPE_CHARS.isdisjoint(value):
        return value
    out = []
    for ch in value:
        if ch in _ESCAPE_CHARS:
            out.append("%{:02X}".format(ord(ch)))
        else:
            out.append(ch)
    return "".join(out)


def unescape_path_name(fragment: str) -> str:
    """Hive-escaped directory-name fragment → raw partition value."""
    out = []
    i = 0
    n = len(fragment)
    while i < n:
        ch = fragment[i]
        if ch == "%" and i + 2 < n + 1 and i + 3 <= n:
            try:
                out.append(chr(int(fragment[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(ch)
        i += 1
    return "".join(out)
