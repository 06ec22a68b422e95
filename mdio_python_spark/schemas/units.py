"""Unit models (``src/mdio/builder/schemas/v1/units.py:14-105``).

The reference builds pint-backed enums and pydantic unit models
(``{"length": "ft"}``-shaped JSON). pint is not in this container, so the
same surface is restated directly: symbol enums per quantity, one-field
pydantic models keyed by the quantity name (JSON-compatible with the
reference's ``create_unit_model`` output), plus exact SI conversion
factors — the piece of pint the engine actually needs (e.g. the
measurement_system m/ft handling in ingest).
"""

from __future__ import annotations

from enum import Enum

from pydantic import BaseModel


class LengthUnit(str, Enum):
    MILLIMETER = "mm"
    CENTIMETER = "cm"
    METER = "m"
    KILOMETER = "km"
    INCH = "in"
    FOOT = "ft"
    YARD = "yd"
    MILE = "mi"


class TimeUnit(str, Enum):
    NANOSECOND = "ns"
    MICROSECOND = "us"
    MILLISECOND = "ms"
    SECOND = "s"
    MINUTE = "min"
    HOUR = "h"
    DAY = "d"


class DensityUnit(str, Enum):
    GRAMS_PER_CC = "g/cm3"
    KILOGRAMS_PER_M3 = "kg/m3"
    POUNDS_PER_GAL = "lb/gal"


class SpeedUnit(str, Enum):
    METERS_PER_SECOND = "m/s"
    FEET_PER_SECOND = "ft/s"


class AngleUnit(str, Enum):
    DEGREES = "deg"
    RADIANS = "rad"


class FrequencyUnit(str, Enum):
    HERTZ = "Hz"


class VoltageUnit(str, Enum):
    MICROVOLT = "uV"
    MILLIVOLT = "mV"
    VOLT = "V"


class LengthUnitModel(BaseModel):
    length: LengthUnit


class TimeUnitModel(BaseModel):
    time: TimeUnit


class DensityUnitModel(BaseModel):
    density: DensityUnit


class SpeedUnitModel(BaseModel):
    speed: SpeedUnit


class AngleUnitModel(BaseModel):
    angle: AngleUnit


class FrequencyUnitModel(BaseModel):
    frequency: FrequencyUnit


class VoltageUnitModel(BaseModel):
    voltage: VoltageUnit


AllUnitModel = (
    LengthUnitModel
    | TimeUnitModel
    | AngleUnitModel
    | DensityUnitModel
    | SpeedUnitModel
    | FrequencyUnitModel
    | VoltageUnitModel
)

# exact SI factors (value_in_SI = value * factor)
_TO_SI: dict[Enum, float] = {
    LengthUnit.MILLIMETER: 0.001,
    LengthUnit.CENTIMETER: 0.01,
    LengthUnit.METER: 1.0,
    LengthUnit.KILOMETER: 1000.0,
    LengthUnit.INCH: 0.0254,
    LengthUnit.FOOT: 0.3048,
    LengthUnit.YARD: 0.9144,
    LengthUnit.MILE: 1609.344,
    TimeUnit.NANOSECOND: 1e-9,
    TimeUnit.MICROSECOND: 1e-6,
    TimeUnit.MILLISECOND: 1e-3,
    TimeUnit.SECOND: 1.0,
    TimeUnit.MINUTE: 60.0,
    TimeUnit.HOUR: 3600.0,
    TimeUnit.DAY: 86400.0,
    DensityUnit.GRAMS_PER_CC: 1000.0,
    DensityUnit.KILOGRAMS_PER_M3: 1.0,
    DensityUnit.POUNDS_PER_GAL: 119.8264273,
    SpeedUnit.METERS_PER_SECOND: 1.0,
    SpeedUnit.FEET_PER_SECOND: 0.3048,
    AngleUnit.DEGREES: 0.017453292519943295,
    AngleUnit.RADIANS: 1.0,
    FrequencyUnit.HERTZ: 1.0,
    VoltageUnit.MICROVOLT: 1e-6,
    VoltageUnit.MILLIVOLT: 1e-3,
    VoltageUnit.VOLT: 1.0,
}


def convert(value: float, src: Enum, dst: Enum) -> float:
    """Exact-factor unit conversion within one quantity kind."""
    if type(src) is not type(dst):
        raise ValueError(f"cannot convert {src} -> {dst}: different quantities")
    return value * _TO_SI[src] / _TO_SI[dst]


def measurement_system_unit(code: int) -> LengthUnit:
    """SEG-Y binary-header measurement_system -> length unit
    (1 = meters, 2 = feet; the mapping ingest uses)."""
    return LengthUnit.FOOT if code == 2 else LengthUnit.METER
