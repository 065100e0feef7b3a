"""ICAO 24-bit address → registration/country decode (VERDICT r3 item 7).

Reference surface: owrx/icao.py:1-534 (public Annex 10 allocation data +
publicly reverse-engineered registration patterns).  Expected values
below are from the public allocation patterns (dump1090/readsb lineage).
"""

from openwebrx_tpu.services.aircraft import AircraftCache
from openwebrx_tpu.services.icao import country, enrich, registration


class TestRegistration:
    def test_us_n_numbers(self):
        # N-number block starts at 0xA00001 = N1
        assert registration(0xA00001) == "N1"
        assert registration(0xA00002) == "N1A"
        assert registration(0xA00003) == "N1AA"
        # last US address
        assert registration(0xA00001 + 915398) is not None
        assert registration(0xA00001 + 915399) is None
        assert registration(0xA00000) is None

    def test_german_stride(self):
        assert registration(0x3C4421) == "D-AAAA"
        assert registration(0x3C4422) == "D-AAAB"
        # second German block (P..Z suffixes, 26-stride)
        assert registration(0x3C0001) == "D-APAA"

    def test_canada(self):
        assert registration(0xC00001) == "C-FAAA"
        assert registration(0xC044A9) == "C-GAAA"

    def test_japan(self):
        # the reference's ja_reg contains a transcription bug (it compares
        # the raw icao, not the offset, against the range limit and so
        # never fires); these match the upstream readsb pattern
        assert registration(0x840001) == "JA0001"
        assert registration(0x86EB26) == "JA8822"
        assert registration(0x840000 + 229840) is None

    def test_korea_hl(self):
        assert registration(0x71BA00) == "HL7200"
        assert registration(0x71C000) == "HL8000"

    def test_numeric_blocks(self):
        assert registration(0x140000) == "RA-00000"
        assert registration(0x140001) == "RA-00001"
        assert registration(0x0B03E8) == "CU-T1000"

    def test_unknown(self):
        assert registration(0x7C0123) is None      # Australia: no pattern


class TestCountry:
    def test_major_allocations(self):
        assert country(0xA12345) == ("US", "United States")
        assert country(0x3C0001) == ("DE", "Germany")
        assert country(0x7C0000) == ("AU", "Australia")
        # 0x400000 itself is Bermuda's sub-block inside the UK range
        assert country(0x400000)[0] == "BM"
        assert country(0x406000)[0] == "GB"
        assert country(0x780123) == ("CN", "China")

    def test_specific_inside_unassigned_superblock(self):
        # 0x501C00.. Albania sits INSIDE the 0x500000-0x5FFFFF
        # "Unassigned (EUR/NAT)" super-range — specific range must win
        c = country(0x501C00)
        assert c is not None and c[0] is not None
        # …while a gap address in the same super-range reports unassigned
        code, name = country(0x569220)
        assert code is None and "Unassigned" in name

    def test_out_of_table(self):
        assert country(0x000001) is None


class TestEnrichment:
    def test_enrich_fields(self):
        e = enrich("a4d24c")
        assert e["ccode"] == "US" and e["registration"].startswith("N")
        assert enrich("nonsense") == {}

    def test_cache_integration(self):
        cache = AircraftCache()
        cache.update("A4D24C", {"mode": "ADSB", "icao": "A4D24C"})
        entry = cache.all()["A4D24C"]
        assert entry["country"] == "United States"
        assert entry["registration"].startswith("N")
