"""Unit constants + multipliers (M1), digit-for-digit from the reference
(fields.py:12-23 constants, fields.py:367-405 multiplier ladder)."""

LENGTH_METER = 1101
LENGTH_KILOMETER = 1102
LENGTH_FEET = 2101
LENGTH_YARD = 2102
LENGTH_MILE = 2103
LENGTH_NMILE = 2104
AREA_SQ_METER = 100 + LENGTH_METER
AREA_SQ_KILOMETER = 100 + LENGTH_KILOMETER
AREA_SQ_FEET = 100 + LENGTH_FEET
AREA_SQ_MILE = 100 + LENGTH_MILE
AREA_HECTARE = 1255
AREA_ACRE = 2255

# srs linear unit -> meters factor (fields.py:367-373)
SRS_UNIT_FACTOR = {"meter": 1.0, "feet": 0.092903}

# unit code -> (is_area, multiplier vs meters) (fields.py:375-405)
UNIT_MULTIPLIER = {
    LENGTH_METER: (False, 1.0),
    AREA_SQ_METER: (True, 1.0),
    LENGTH_KILOMETER: (False, 1e-3),
    LENGTH_FEET: (False, 3.28084),
    LENGTH_YARD: (False, 1.09361),
    LENGTH_MILE: (False, 6.21371e-4),
    LENGTH_NMILE: (False, 5.39957e-4),
    AREA_SQ_KILOMETER: (True, 1e-6),
    AREA_HECTARE: (True, 1e-4),
    AREA_SQ_FEET: (True, 10.7639),
    AREA_SQ_MILE: (True, 3.86102e-7),
    AREA_ACRE: (True, 2.47105e-4),
}
