"""A/B one fused_drs_block config (knobs are import-time): drive as
  for th in 4 8 16; do for bf in 0 1; do
    IR_DRS_TH=$th IR_DRS_BF16=$bf python tools/ab_drs_block.py; done; done
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from profile_drs_fused import block_cost

if __name__ == "__main__":
    th = os.environ.get("IR_DRS_TH", "0")
    bf = os.environ.get("IR_DRS_BF16", "1")
    print(f"th={th} bf16={bf}", flush=True)
    block_cost(96, 512, 512, 1)
    block_cost(48, 512, 512, 1)
