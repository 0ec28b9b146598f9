from .census_kernel import census_sad_pallas, census_sad_auto
