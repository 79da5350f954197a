"""Result cursor facade mirroring the reference's client contract
(`components/cursor/cursor.hpp:20-60`: a cursor is a vector of ≤1024-row
chunks with size / column_count / typed value access).

On Spark the result set is a DataFrame; materialisation happens lazily on
first access (collect via Arrow). `toLocalIterator` is available for
larger-than-driver results — the reference's chunked-fetch equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class Cursor:
    def __init__(self, df: DataFrame):
        self.df = df
        self._rows = None

    def _materialise(self):
        if self._rows is None:
            self._rows = self.df.collect()
        return self._rows

    def size(self) -> int:
        return len(self._materialise())

    def column_count(self) -> int:
        return len(self.df.columns)

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def value(self, col: int | str, row: int):
        r = self._materialise()[row]
        return r[col] if isinstance(col, int) else r[col]

    def fetchall(self) -> list[tuple]:
        return [tuple(r) for r in self._materialise()]

    def fetchdf(self):
        """Arrow-accelerated pandas materialisation (reference `fetchdf`)."""
        return self.df.toPandas()

    def __iter__(self):
        # chunked iteration without materialising everything on the driver
        return iter(self.df.toLocalIterator())

    def __len__(self) -> int:
        return self.size()
