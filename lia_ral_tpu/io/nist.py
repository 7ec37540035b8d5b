"""Score-file I/O: NIST and LIA_RAL result-line formats.

Capability parity with reference ``LIA_SpkTools/src/IOFormat.cpp``
(``outputResultLine`` NIST format "gender model decision seg score",
fixture ``LIA_Utils/Scoring/test/score.nist``: "F model1 - test1 0";
segmental variant adds begin/end seconds, fixture
``LIA_SpkDet/ComputeTest/test/test1.validate.res``:
"M test1 1 test3 0 0.26 5.06601").
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ScoreLine:
    gender: str
    model: str
    decision: str          # "1"/"0" or "-"
    seg: str
    score: float
    begin: float | None = None   # segmental mode only
    end: float | None = None

    def format(self) -> str:
        if self.begin is not None:
            return (f"{self.gender} {self.model} {self.decision} {self.seg} "
                    f"{_fmt(self.begin)} {_fmt(self.end)} {_fmt(self.score)}")
        return (f"{self.gender} {self.model} {self.decision} {self.seg} "
                f"{_fmt(self.score)}")


def _fmt(v: float | None) -> str:
    if v is None:
        return ""
    txt = f"{v:g}"
    return txt


def parse_score_line(line: str) -> ScoreLine | None:
    p = line.split()
    if len(p) == 5:
        return ScoreLine(p[0], p[1], p[2], p[3], float(p[4]))
    if len(p) == 7:
        return ScoreLine(p[0], p[1], p[2], p[3], float(p[6]),
                         begin=float(p[4]), end=float(p[5]))
    return None


def read_nist_scores(path: str) -> list[ScoreLine]:
    out: list[ScoreLine] = []
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            sl = parse_score_line(line)
            if sl is not None:
                out.append(sl)
    return out


def write_nist_scores(path: str, lines: list[ScoreLine]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for sl in lines:
            f.write(sl.format() + "\n")
