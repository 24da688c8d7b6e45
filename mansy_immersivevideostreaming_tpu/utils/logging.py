"""Console tee + plain-ASCII table rendering.

``ConsoleLogger`` replicates the reference's stdout tee
(reference ``viewport_prediction/utils/console_logger.py:1-12``).
``ascii_table`` replaces the reference's PrettyTable dependency with a tiny
formatter producing the same box layout.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence


class ConsoleLogger:
    """Tee writes to several streams (stdout + log files)."""

    def __init__(self, *streams):
        self.streams = streams

    def write(self, data):
        # flush eagerly: the CLIs never close the tee'd log file, so buffered
        # writes would otherwise be lost to concurrent readers (and to crash)
        for s in self.streams:
            s.write(data)
            s.flush()

    def flush(self):
        for s in self.streams:
            s.flush()


def ascii_table(field_names: Sequence[str], rows: Iterable[Sequence]) -> str:
    """PrettyTable-style box table."""
    rows = [[str(c) for c in r] for r in rows]
    names = [str(n) for n in field_names]
    widths = [len(n) for n in names]
    for r in rows:
        for i, c in enumerate(r):
            widths[i] = max(widths[i], len(c))
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out: List[str] = [sep]
    out.append("|" + "|".join(f" {n:^{w}} " for n, w in zip(names, widths)) + "|")
    out.append(sep)
    for r in rows:
        out.append("|" + "|".join(f" {c:^{w}} " for c, w in zip(r, widths)) + "|")
    out.append(sep)
    return "\n".join(out)
