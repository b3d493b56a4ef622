#!/usr/bin/env python3
"""Incorporate new CORRECTNESS_r*.json rounds into GATE_LEDGER.json.

Run at the START of a round, BEFORE editing any query module, so the
recorded fingerprints equal the fingerprints at gate time (the driver
commits CORRECTNESS right after the gate with no edits in between).
See k_means_in_mapreduce_spark/gate_ledger.py for the design.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_in_mapreduce_spark import gate_ledger as gl  # noqa: E402
# (incorporate_correctness imports the registry itself, which registers
# every query as an import side-effect — nothing else to do here)

ledger = gl.load_ledger()
added = gl.incorporate_correctness(ledger)
gl.save_ledger(ledger)
print(f"incorporated: {added or 'nothing new'}; "
      f"{len(ledger['queries'])} queries in ledger")
