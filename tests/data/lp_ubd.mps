* Unbounded LP: min -x1 - x2
*   s.t. x1 - x2 = 1 ; x >= 0
NAME          LPUBD
ROWS
 N  COST
 E  R1
COLUMNS
    X1        COST      -1.0       R1        1.0
    X2        COST      -1.0       R1        -1.0
RHS
    RHS1      R1        1.0
ENDATA
