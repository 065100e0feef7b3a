"""Callsign and MMSI lookup: country/entity identification.

Reference: ``owrx/lookup.py`` (1376 LoC) — ham callsign prefix → DXCC
country table and MMSI (MID) parsing.  The table here is a compact version
of the public ITU prefix allocation covering the most active entities;
longest-prefix matching, first match wins.
"""

from __future__ import annotations

# (prefix-range or prefix, ISO country code, name) — ITU allocations
PREFIXES = [
    ("1A", None, "Sov. Military Order of Malta"),
    ("2", "gb", "United Kingdom"), ("G", "gb", "United Kingdom"),
    ("M", "gb", "United Kingdom"),
    ("3A", "mc", "Monaco"), ("3V", "tn", "Tunisia"),
    ("3W", "vn", "Vietnam"), ("4J", "az", "Azerbaijan"),
    ("4L", "ge", "Georgia"), ("4X", "il", "Israel"), ("4Z", "il", "Israel"),
    ("5A", "ly", "Libya"), ("5B", "cy", "Cyprus"),
    ("6Y", "jm", "Jamaica"), ("7X", "dz", "Algeria"),
    ("9A", "hr", "Croatia"), ("9H", "mt", "Malta"),
    ("9K", "kw", "Kuwait"), ("9M", "my", "Malaysia"),
    ("9V", "sg", "Singapore"), ("9Y", "tt", "Trinidad and Tobago"),
    ("A4", "om", "Oman"), ("A6", "ae", "United Arab Emirates"),
    ("A7", "qa", "Qatar"), ("A9", "bh", "Bahrain"),
    ("AP", "pk", "Pakistan"),
    ("BV", "tw", "Taiwan"), ("BY", "cn", "China"), ("B", "cn", "China"),
    ("C3", "ad", "Andorra"), ("C6", "bs", "Bahamas"),
    ("CE", "cl", "Chile"), ("CN", "ma", "Morocco"),
    ("CO", "cu", "Cuba"), ("CM", "cu", "Cuba"),
    ("CT", "pt", "Portugal"), ("CX", "uy", "Uruguay"),
    ("D2", "ao", "Angola"), ("D4", "cv", "Cape Verde"),
    ("DL", "de", "Germany"), ("DA", "de", "Germany"), ("DB", "de", "Germany"),
    ("DC", "de", "Germany"), ("DD", "de", "Germany"), ("DF", "de", "Germany"),
    ("DG", "de", "Germany"), ("DH", "de", "Germany"), ("DJ", "de", "Germany"),
    ("DK", "de", "Germany"), ("DM", "de", "Germany"), ("DO", "de", "Germany"),
    ("DU", "ph", "Philippines"),
    ("EA", "es", "Spain"), ("EB", "es", "Spain"), ("EC", "es", "Spain"),
    ("ED", "es", "Spain"), ("EE", "es", "Spain"),
    ("EI", "ie", "Ireland"), ("EK", "am", "Armenia"),
    ("EP", "ir", "Iran"), ("ER", "md", "Moldova"),
    ("ES", "ee", "Estonia"), ("ET", "et", "Ethiopia"),
    ("EU", "by", "Belarus"), ("EV", "by", "Belarus"), ("EW", "by", "Belarus"),
    ("EX", "kg", "Kyrgyzstan"), ("EY", "tj", "Tajikistan"),
    ("EZ", "tm", "Turkmenistan"),
    ("F", "fr", "France"),
    ("HA", "hu", "Hungary"), ("HG", "hu", "Hungary"),
    ("HB9", "ch", "Switzerland"), ("HB3", "ch", "Switzerland"),
    ("HB0", "li", "Liechtenstein"), ("HB", "ch", "Switzerland"),
    ("HC", "ec", "Ecuador"), ("HH", "ht", "Haiti"),
    ("HI", "do", "Dominican Republic"), ("HK", "co", "Colombia"),
    ("HL", "kr", "South Korea"), ("HP", "pa", "Panama"),
    ("HR", "hn", "Honduras"), ("HS", "th", "Thailand"),
    ("HZ", "sa", "Saudi Arabia"),
    ("I", "it", "Italy"),
    ("JA", "jp", "Japan"), ("JE", "jp", "Japan"), ("JF", "jp", "Japan"),
    ("JG", "jp", "Japan"), ("JH", "jp", "Japan"), ("JI", "jp", "Japan"),
    ("JJ", "jp", "Japan"), ("JK", "jp", "Japan"), ("JL", "jp", "Japan"),
    ("JM", "jp", "Japan"), ("JN", "jp", "Japan"), ("JO", "jp", "Japan"),
    ("JP", "jp", "Japan"), ("JQ", "jp", "Japan"), ("JR", "jp", "Japan"),
    ("JS", "jp", "Japan"), ("JT", "mn", "Mongolia"), ("JY", "jo", "Jordan"),
    ("K", "us", "United States"),
    ("LA", "no", "Norway"), ("LB", "no", "Norway"),
    ("LU", "ar", "Argentina"), ("LW", "ar", "Argentina"),
    ("LX", "lu", "Luxembourg"), ("LY", "lt", "Lithuania"),
    ("LZ", "bg", "Bulgaria"),
    ("N", "us", "United States"),
    ("OA", "pe", "Peru"), ("OD", "lb", "Lebanon"),
    ("OE", "at", "Austria"), ("OH", "fi", "Finland"),
    ("OK", "cz", "Czechia"), ("OL", "cz", "Czechia"),
    ("OM", "sk", "Slovakia"), ("ON", "be", "Belgium"), ("OO", "be", "Belgium"),
    ("OT", "be", "Belgium"), ("OU", "dk", "Denmark"), ("OV", "dk", "Denmark"),
    ("OX", "gl", "Greenland"), ("OY", "fo", "Faroe Islands"),
    ("OZ", "dk", "Denmark"),
    ("PA", "nl", "Netherlands"), ("PB", "nl", "Netherlands"),
    ("PC", "nl", "Netherlands"), ("PD", "nl", "Netherlands"),
    ("PE", "nl", "Netherlands"), ("PH", "nl", "Netherlands"),
    ("PI", "nl", "Netherlands"),
    ("PY", "br", "Brazil"), ("PP", "br", "Brazil"), ("PU", "br", "Brazil"),
    ("R", "ru", "Russia"),
    ("SA", "se", "Sweden"), ("SK", "se", "Sweden"), ("SL", "se", "Sweden"),
    ("SM", "se", "Sweden"),
    ("SN", "pl", "Poland"), ("SO", "pl", "Poland"), ("SP", "pl", "Poland"),
    ("SQ", "pl", "Poland"), ("SR", "pl", "Poland"),
    ("SU", "eg", "Egypt"), ("SV", "gr", "Greece"),
    ("T7", "sm", "San Marino"), ("TA", "tr", "Turkey"), ("TB", "tr", "Turkey"),
    ("TC", "tr", "Turkey"), ("TF", "is", "Iceland"),
    ("TG", "gt", "Guatemala"), ("TI", "cr", "Costa Rica"),
    ("TK", "fr", "Corsica"), ("TR", "ga", "Gabon"),
    ("UA", "ru", "Russia"), ("UB", "ru", "Russia"), ("UC", "ru", "Russia"),
    ("UK", "uz", "Uzbekistan"), ("UN", "kz", "Kazakhstan"),
    ("UP", "kz", "Kazakhstan"), ("UR", "ua", "Ukraine"),
    ("US", "ua", "Ukraine"), ("UT", "ua", "Ukraine"), ("UV", "ua", "Ukraine"),
    ("UW", "ua", "Ukraine"), ("UX", "ua", "Ukraine"), ("UY", "ua", "Ukraine"),
    ("UZ", "ua", "Ukraine"),
    ("VE", "ca", "Canada"), ("VA", "ca", "Canada"), ("VO", "ca", "Canada"),
    ("VY", "ca", "Canada"),
    ("VK", "au", "Australia"), ("VU", "in", "India"),
    ("W", "us", "United States"), ("AA", "us", "United States"),
    ("AB", "us", "United States"), ("AC", "us", "United States"),
    ("AD", "us", "United States"), ("AE", "us", "United States"),
    ("AF", "us", "United States"), ("AG", "us", "United States"),
    ("AI", "us", "United States"), ("AJ", "us", "United States"),
    ("AK", "us", "United States"), ("AL", "us", "United States"),
    ("XE", "mx", "Mexico"), ("XA", "mx", "Mexico"),
    ("YB", "id", "Indonesia"), ("YC", "id", "Indonesia"),
    ("YL", "lv", "Latvia"), ("YO", "ro", "Romania"), ("YP", "ro", "Romania"),
    ("YR", "ro", "Romania"), ("YS", "sv", "El Salvador"),
    ("YT", "rs", "Serbia"), ("YU", "rs", "Serbia"),
    ("YV", "ve", "Venezuela"),
    ("Z3", "mk", "North Macedonia"), ("ZA", "al", "Albania"),
    ("ZB", "gi", "Gibraltar"), ("ZL", "nz", "New Zealand"),
    ("ZP", "py", "Paraguay"), ("ZS", "za", "South Africa"),
]

# sort longest-prefix first for longest-match semantics
_SORTED = sorted(PREFIXES, key=lambda e: -len(e[0]))


class HamCallsign:
    @staticmethod
    def get_country(callsign: str):
        """→ (iso_code or None, country name) or None."""
        call = callsign.upper().split("/")[0].strip("*")
        for prefix, code, name in _SORTED:
            if call.startswith(prefix):
                return (code, name)
        return None


# ITU Maritime Identification Digits (compact common subset)
MID = {
    201: "Albania", 202: "Andorra", 203: "Austria", 204: "Azores",
    205: "Belgium", 211: "Germany", 218: "Germany", 219: "Denmark",
    220: "Denmark", 224: "Spain", 225: "Spain", 226: "France",
    227: "France", 228: "France", 230: "Finland", 231: "Faroe Islands",
    232: "United Kingdom", 233: "United Kingdom", 234: "United Kingdom",
    235: "United Kingdom", 236: "Gibraltar", 237: "Greece", 238: "Croatia",
    239: "Greece", 244: "Netherlands", 245: "Netherlands",
    246: "Netherlands", 247: "Italy", 248: "Malta", 250: "Ireland",
    255: "Madeira", 257: "Norway", 258: "Norway", 259: "Norway",
    261: "Poland", 263: "Portugal", 264: "Romania", 265: "Sweden",
    266: "Sweden", 269: "Switzerland", 271: "Turkey", 272: "Ukraine",
    273: "Russia", 303: "Alaska", 316: "Canada", 338: "United States",
    366: "United States", 367: "United States", 368: "United States",
    412: "China", 413: "China", 416: "Taiwan", 419: "India",
    431: "Japan", 432: "Japan", 440: "South Korea", 441: "South Korea",
    503: "Australia", 512: "New Zealand", 525: "Indonesia",
    533: "Malaysia", 563: "Singapore", 564: "Singapore",
    710: "Brazil", 730: "Colombia", 735: "Ecuador", 760: "Peru",
}


class MmsiNumber:
    @staticmethod
    def parse(mmsi: str) -> dict:
        """MMSI → {type, country} per the public ITU numbering rules."""
        mmsi = mmsi.strip()
        out = {"mmsi": mmsi}
        if not mmsi.isdigit() or len(mmsi) != 9:
            out["type"] = "invalid"
            return out
        if mmsi.startswith("00"):
            out["type"] = "coast station"
            mid = int(mmsi[2:5])
        elif mmsi.startswith("0"):
            out["type"] = "group"
            mid = int(mmsi[1:4])
        elif mmsi.startswith("111"):
            out["type"] = "SAR aircraft"
            mid = int(mmsi[3:6])
        elif mmsi.startswith("98") or mmsi.startswith("99"):
            out["type"] = "craft associated with parent ship"
            mid = int(mmsi[2:5])
        else:
            out["type"] = "ship"
            mid = int(mmsi[0:3])
        country = MID.get(mid)
        if country:
            out["country"] = country
        return out
