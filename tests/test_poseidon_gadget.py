"""In-circuit Poseidon must match the host transcript sponge exactly."""
from halo2_zkcert_tpu.builder import GateBuilder
from halo2_zkcert_tpu.circuits.poseidon_gadget import (
    PoseidonSpongeGadget, permute_cells)
from halo2_zkcert_tpu.plonk import run_mock
from halo2_zkcert_tpu.transcript.poseidon import PoseidonSponge, permute


def test_permutation_matches_host():
    gb = GateBuilder(lookup_bits=7)
    state = [gb.witness(v) for v in (3, 7, 11)]
    out = permute_cells(gb, state)
    assert [c.value for c in out] == permute([3, 7, 11])


def test_sponge_matches_host_and_constraints_hold():
    gb = GateBuilder(lookup_bits=7)
    sp = PoseidonSpongeGadget(gb)
    sp.update([gb.witness(123), gb.witness(456)])
    c1 = sp.squeeze()
    sp.update([gb.witness(789)])
    c2 = sp.squeeze()
    gb.expose_public(c1)
    gb.expose_public(c2)

    host = PoseidonSponge()
    host.update([123, 456])
    h1 = host.squeeze()
    host.update([789])
    h2 = host.squeeze()
    assert (c1.value, c2.value) == (h1, h2)

    data, advice, instances = gb.finalize(13)
    assert instances[0] == [h1, h2]
    assert run_mock(data, advice, instances) == []
