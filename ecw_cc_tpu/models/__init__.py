"""Host-side models: molecule/basis, integral engine, SCF, ERIs, target generation, driver."""
