"""Physical/chemical constant tables.

Behavioural counterpart of the reference's point_vs/constants.py: standard
amino-acid triplet codes, Van der Waals radii by atomic number (Alvarez 2013
consistent values, as used by the reference), and the GNINA1.0 test-set PDB
ids used for dataset decontamination.
"""
from __future__ import annotations

AA_TRIPLET_CODES = frozenset((
    'ALA ARG ASN ASP CYS GLN GLU GLY HIS ILE '
    'LEU LYS MET PHE PRO SER THR TRP TYR VAL').split())

# Van der Waals radius (Angstrom) indexed by atomic number 1..94.
_VDW_TABLE = (
    1.10, 1.40, 1.82, 1.53, 1.92, 1.70, 1.55, 1.52, 1.47, 1.54,   # H..Ne
    2.27, 1.73, 1.84, 2.10, 1.80, 1.80, 1.75, 1.88, 2.75, 2.31,   # Na..Ca
    2.15, 2.11, 2.07, 2.06, 2.05, 2.04, 2.00, 1.97, 1.96, 2.01,   # Sc..Zn
    1.87, 2.11, 1.85, 1.90, 1.85, 2.02, 3.03, 2.49, 2.32, 2.23,   # Ga..Zr
    2.18, 2.17, 2.16, 2.13, 2.10, 2.10, 2.11, 2.18, 1.93, 2.17,   # Nb..Sn
    2.06, 2.06, 1.98, 2.16, 3.43, 2.68, 2.43, 2.42, 2.40, 2.39,   # Sb..Nd
    2.38, 2.36, 2.35, 2.34, 2.33, 2.31, 2.30, 2.29, 2.27, 2.26,   # Pm..Yb
    2.24, 2.23, 2.22, 2.18, 2.16, 2.16, 2.13, 2.13, 2.14, 2.23,   # Lu..Hg
    1.96, 2.02, 2.07, 1.97, 2.02, 2.20, 3.48, 2.83, 2.47, 2.45,   # Tl..Th
    2.43, 2.41, 2.39, 2.40,                                        # Pa..Pu
)

VDW_RADII = {z + 1: r for z, r in enumerate(_VDW_TABLE)}

# PDB ids in the GNINA 1.0 held-out test set (ref: point_vs/constants.py
# GNINA_TEST_PDBIDS); kept for train/test decontamination tooling.
GNINA_TEST_PDBIDS = frozenset("""
5n0f 6mj7 5orw 5ouh 5t9w 6gon 5yhe 6eog 5l8y 5j2x 5zc5 6fs0 5m28 5j6a 5u0g
5otz 5g5v 5gsa 5ldm 6ex1 6bhv 6e9a 5vm0 5twj 5oa2 6dh8 6dh6 5nap 5nee 5k1d
6ckw 6eol 6got 6ma5 5n25 6hly 5n1s 5oei 6gw4 5o5a 6g37 6g39 5qal 6h37 5ult
5yhg 5fsc 5ta2 6gnw 5nk7 6hrq 5tya 6eed 5o9p 6eya 6ma3 5zaj 6g2l 6ei5 5nzn
5j20 6gfs 5g5z 6f3b 5ose 6guc 5nxo 5msb 5ldp 6ayq 6d5e 5owl 6f9v 5mwp 6gg4
6exi 5m04 5xvg 5eij 6dh7 5qa8 5laq 5mpn 6eln 6fnr 6hh5 5yh8 6cdj 5t9u 5y8y
5tt3 6h5x 5o1d 5irr 5g5f 5os2 5lsh 6ftp 6d56 6ma2 5kab 6cpw 5z7b 6cfc 5yj8
5nvv 6epy 6hai 6fnj 6gwr 5h5f 6dil 6faf 6d5g 6dj7 5ny1 6g36 5kad 6guk 6gnp
6fhq 6gnr 5nxw 6h34 6gl8 6dif 6dj5 5g2b 5j27 6g3v 5nw1 6cvf 5nzf 6b59 6fui
5os5 6g35 5y94 5nz4 5umx 6g9i 5wlo 6fyz 5ya5 6cbg 5om2 5fyx 6gjj 5nw7 5v0n
5tbe 5j6l 6elp 6glb 6mjf 5yfs 6fba 5l8c 5oa6 6hqy 5tef 5oot 5gof 6fa4 5nxp
6dai 6d5j 6f90 6ej3 5z99 6ce6 6cvv 6f20 6cwh 6czc 6eyb 5wgp 5yjm 5w44 5tpx
6f05 6fe0 6fgg 6fuj 5wex 6e7j 6cn5 5op5 5xsr 5mwh 6hsh 6g0z 5y12 5os4 6h36
5o9r 5nau 6gf9 4yb5 5os8 6gnm 5f61 6e4a 6guh 5zkc 5n9r 5vja 6ey9 6cze 5xg5
5ka7 5nxg 5mkr 5yft 6iiu 5zag 5nya 5zo8 6fnf 6b4d 5ka1 5qay 5nw2 6h2z 6bm6
6ey8 5umy 4zcs 6fng 5vr8 6eis 6faa 5y13 5ufs 6ma4 6f1n 6h8s 5wp5 6bdy 6ftz
5org 6d9x 5jq5 5k9w 6fni 6g38 6gjl 6c0s 5txy 6gl9 5uln 6g2m 6g14 5xpi 5oss
5u4b 6evr 5ork 5ad1 5tcy 6fhk 5mjn 5we9 6c7x 5nbw 6dj2 5ka9 6dh1 5vyy 6eij
5g57 5xo7 6cjv 6fe1 6chp 6dj1 6bbx 5z7j 6gzd 5orj 5odx 6c7w 6hd6 5f63 5yz2
5u49 5zaf 6dh2 6d50 5g60 6b4n 6fs1 6cks 5mpk 6gjr 6dq4 5wcm 6exs 6hlx 5j9x
5nze 5j6m 6htg 5nyh 6ced 5ny3 5n1r 6g3a 5n0e 6gue 6g3q 5za8 5j8u 5n24 6eq8
5var 6g34 5u0f 5t7s 5l8a 6gvz 6h33 6eif 5nea 5om3 5tfx 6c7q 5upz 5llg 6gjm
5oq8 5j64 5j6n 6f9u 5orv 6d5h 6aqs 6gzm 6dar 5yl2 6dak 6d55 6ayo 5kej 6h38
5mxf 5o1f 6epz 5uc4 5xva 6eir 6fnq 5ucj 5vl2 6cwn 5xmx 6b1k 6g98 6eiq 5voj
5ost 6bm5 5aan 5orh 6fmj 5oqu 5o07 5n1z 5u0e 6cbf 5o9o 5u0d 5vd3 5t9z 5ulp
5uff 6ge7 5g1z 5os7 5f62 5vgy 5vp9 5nxi 6gjn 5meh 5x62 5nw0 5ne5 5j8m 5nvx
5uov 6fmc 5mwy 6fo5 5uxf 5nlk 5za9 6ayi 5ty9 6hpw 6ayr 6cdl 5zae 6ekq 6el5
6ht1 5k1f 6eq1 5g61 6ej2 6hh3 6b7b 5tuo 6ckr 5om7 6gla 6czb 6h29 5z5f 5nwe
5nvw 6gji 6gfz 6elo 5ov8 6g9u 5f60 5osl 5wqc 5za7 5o1h 6ghh 6f28 6fv4 6fuh
5o9y 6eyt 5otr 6f92 6epa 5o9q
""".split())
