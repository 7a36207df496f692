"""Version identifiers for table/partition versions.

Semantics match the reference's ``Version`` model
(reference: core/src/main/scala/dev/chronicles/core/Version.scala:15-65):

* a version is ``(timestamp, uuid)`` rendered as
  ``yyyyMMdd-HHmmss.nnnnnnnnn-<uuid>`` (nanosecond-padded),
* the special ``UNVERSIONED`` sentinel has an empty label and maps to the
  bare, un-suffixed path (adopt-existing-data-in-place semantics),
* labels sort lexicographically in timestamp order (used nowhere for
  correctness — commit order is authoritative — but convenient).
"""

from __future__ import annotations

import re
import uuid as _uuid
from dataclasses import dataclass
from datetime import datetime, timezone

# reference: core/.../Version.scala:42-44 (TimestampAndUuidRegex)
_LABEL_RE = re.compile(
    r"^(\d{8}-\d{6})\.(\d{9})-"
    r"([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12})$"
)

_TS_FORMAT = "%Y%m%d-%H%M%S"


@dataclass(frozen=True, order=True)
class Version:
    """A concrete version label, or the unversioned sentinel (label == '')."""

    label: str

    @property
    def is_unversioned(self) -> bool:
        return self.label == ""

    def __str__(self) -> str:  # pragma: no cover - trivial
        return self.label or "<unversioned>"


UNVERSIONED = Version("")


def make_label(ts: datetime, nanos_extra: int, uid: _uuid.UUID) -> str:
    """Render the canonical label. ``nanos_extra`` is the sub-second part in ns."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    return f"{ts.strftime(_TS_FORMAT)}.{nanos_extra:09d}-{uid}"


def generate_version(now: datetime | None = None) -> Version:
    """Fresh ``(now, uuid4)`` version (reference: core/.../Version.scala:39)."""
    if now is None:
        now = datetime.now(timezone.utc)
    if now.tzinfo is not None:
        now = now.astimezone(timezone.utc).replace(tzinfo=None)
    nanos = now.microsecond * 1000
    return Version(make_label(now.replace(microsecond=0), nanos, _uuid.uuid4()))


def parse_version(label: str) -> Version:
    """Parse a label; empty string yields UNVERSIONED; invalid raises ValueError.

    reference: core/.../Version.scala:49-65 and tests VersionSpec.scala:24-53.
    """
    if label == "":
        return UNVERSIONED
    m = _LABEL_RE.match(label)
    if not m:
        raise ValueError(f"invalid version label: {label!r}")
    # validate timestamp + uuid parse exactly like the reference
    datetime.strptime(m.group(1), _TS_FORMAT)
    _uuid.UUID(m.group(3))
    return Version(label)


def is_valid_label(label: str) -> bool:
    try:
        parse_version(label)
        return True
    except ValueError:
        return False
