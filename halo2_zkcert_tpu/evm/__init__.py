"""EVM verifier path (SURVEY.md §3.5).

Reference behavior: snark-verifier's `EvmLoader` -> Yul verifier +
`gen_evm_verifier_shplonk` / `gen_evm_proof_shplonk` / `evm_verify`
(cli.rs:512-527 [dep]).  Here verification is captured as a straight-line
IR (one program per vk) with two backends:

* `execute_ir`  — Python executor (tests the program against the native
  verifier; no EVM runtime exists in this environment, SURVEY.md §2b revm
  row — the executor plays revm's role for correctness checks);
* `emit_solidity` — renders the IR as a Solidity contract using the BN254
  precompiles (ecAdd 0x6, ecMul 0x7, ecPairing 0x8, modexp 0x5).
"""
from .ir import EvmIrLoader, build_verifier_ir, execute_ir
from .solidity import emit_solidity, gen_evm_verifier
