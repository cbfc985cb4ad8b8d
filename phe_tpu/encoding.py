"""Fixed-point encoding of signed ints/floats into non-negative residues mod n.

Behavioural contract (bit-exact with the reference, SURVEY.md §7 items 4-5):

* ``EncodedNumber.encode`` — phe/encoding.py:110-199: float precision derived
  from ``math.frexp`` minus the 53 mantissa bits, floored in base-BASE;
  explicit precision via ``floor(log(precision, BASE))``; the mantissa is
  ``round(Fraction(scalar) * Fraction(BASE) ** -exponent)`` (exact rational
  arithmetic, round-half-even); range-checked against ±max_int; negatives
  wrap mod n.
* ``decode`` — phe/encoding.py:201-233: ValueError for residues >= n,
  positive window [0, max_int], negative window [n - max_int, n),
  OverflowError in between; exact ints for exponent >= 0; int/int division
  for negative exponents (the issue-62 fix).
* ``decrease_exponent_to`` — phe/encoding.py:235-265.

The encoding is exact host integer arithmetic by design: the device engine
only ever sees the resulting residues as packed limb tensors (see
phe_tpu.batch for the batched encoder built on top of this class).
"""

import fractions
import math
import sys


class EncodedNumber(object):
    """A float or int encoded as ``mantissa * BASE ** exponent`` mod n.

    Subclass and override BASE / LOG2_BASE to interoperate with parties
    using a different radix (reference: phe/encoding.py:97-102 and
    examples/alternative_base.py).

    Attributes:
      public_key: the PaillierPublicKey whose n / max_int define the
        signed windows.
      encoding (int): non-negative residue mod n holding the mantissa.
      exponent (int): power of BASE scaling the mantissa (usually <= 0).
    """

    BASE = 16
    LOG2_BASE = math.log(BASE, 2)
    FLOAT_MANTISSA_BITS = sys.float_info.mant_dig

    def __init__(self, public_key, encoding, exponent):
        self.public_key = public_key
        self.encoding = encoding
        self.exponent = exponent

    @classmethod
    def encode(cls, public_key, scalar, precision=None, max_exponent=None):
        """Encode an int or float exactly (reference: phe/encoding.py:110-199).

        The exponent is the largest power of BASE that still represents
        `scalar` to float precision (or to the given absolute `precision`),
        clamped from above by `max_exponent`. The mantissa is computed with
        exact rational arithmetic so alternative bases (including odd ones)
        round identically to the reference.
        """
        if precision is None:
            if isinstance(scalar, int):
                prec_exponent = 0
            elif isinstance(scalar, float):
                # Exponent of the float's least significant mantissa bit,
                # floored into base-BASE digits.
                bin_flt_exponent = math.frexp(scalar)[1]
                bin_lsb_exponent = bin_flt_exponent - cls.FLOAT_MANTISSA_BITS
                prec_exponent = math.floor(bin_lsb_exponent / cls.LOG2_BASE)
            else:
                raise TypeError(
                    "Don't know the precision of type %s." % type(scalar)
                )
        else:
            prec_exponent = math.floor(math.log(precision, cls.BASE))

        if max_exponent is None:
            exponent = prec_exponent
        else:
            exponent = min(max_exponent, prec_exponent)

        # Exact rational scaling; round() is banker's rounding, matching the
        # reference's round(Fraction(...)) to the bit.
        int_rep = round(
            fractions.Fraction(scalar) * fractions.Fraction(cls.BASE) ** -exponent
        )

        if abs(int_rep) > public_key.max_int:
            raise ValueError(
                "Integer needs to be within +/- %d but got %d"
                % (public_key.max_int, int_rep)
            )

        return cls(public_key, int_rep % public_key.n, exponent)

    @classmethod
    def encode_many(cls, public_key, values):
        """Vectorised exact encoding of a list of ints/floats.

        Bit-identical to calling ``encode`` per element (same exponent
        selection, same round-half-even mantissa), but the rational
        arithmetic is replaced by exact float scaling when BASE is a power
        of two: scalar * BASE**-exponent is then a power-of-two multiply
        (``math.ldexp``), exact in IEEE-754 up to the float range, and
        Python's round() applies the same banker's rounding. Non-power-of-
        two bases (subclasses) and non-float values fall back to the exact
        rational path.
        """
        log2b = cls.BASE.bit_length() - 1
        pow2_base = cls.BASE == (1 << log2b)
        out = []
        n = public_key.n
        max_int = public_key.max_int
        for scalar in values:
            if isinstance(scalar, EncodedNumber):
                out.append(scalar)
                continue
            if not (pow2_base and isinstance(scalar, float)):
                out.append(cls.encode(public_key, scalar))
                continue
            bin_lsb = math.frexp(scalar)[1] - cls.FLOAT_MANTISSA_BITS
            exponent = math.floor(bin_lsb / cls.LOG2_BASE)
            int_rep = round(math.ldexp(scalar, -log2b * exponent))
            if abs(int_rep) > max_int:
                raise ValueError(
                    "Integer needs to be within +/- %d but got %d"
                    % (max_int, int_rep)
                )
            out.append(cls(public_key, int_rep % n, exponent))
        return out

    def decode(self):
        """Decode back to an int or float (reference: phe/encoding.py:201-233).

        Raises ValueError for corrupted (>= n) residues and OverflowError
        for residues in the overflow-detection window between the positive
        and negative ranges.
        """
        if self.encoding >= self.public_key.n:
            raise ValueError("Attempted to decode corrupted number")
        elif self.encoding <= self.public_key.max_int:
            mantissa = self.encoding
        elif self.encoding >= self.public_key.n - self.public_key.max_int:
            mantissa = self.encoding - self.public_key.n
        else:
            raise OverflowError("Overflow detected in decrypted number")

        if self.exponent >= 0:
            return mantissa * self.BASE ** self.exponent
        else:
            # int / int division keeps exactness until the final float
            # conversion (reference issue 62 / PR 73 behaviour).
            try:
                return mantissa / self.BASE ** -self.exponent
            except OverflowError as e:
                raise OverflowError("decoded result too large for a float") from e

    def decrease_exponent_to(self, new_exp):
        """Re-represent with a lower exponent (phe/encoding.py:235-265)."""
        if new_exp > self.exponent:
            raise ValueError(
                "New exponent %i should be more negative than"
                "old exponent %i" % (new_exp, self.exponent)
            )
        factor = pow(self.BASE, self.exponent - new_exp)
        new_enc = self.encoding * factor % self.public_key.n
        return self.__class__(self.public_key, new_enc, new_exp)
